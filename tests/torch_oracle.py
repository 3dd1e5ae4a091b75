"""Test-only PyTorch oracle.

Reconstructs the reference model tree (netra_ocr/recognition/model/se_model.py,
vgg_model.py, resnet_model.py) out of torch.nn built-ins with state-dict key
names matching the reference checkpoints, plus eager re-implementations of the
reference's piecewise encode (predictor.py:48-83) and greedy/beam decode loops
(predictor.py:85-136). Used ONLY by the test suite to verify that the JAX
implementation + converter are numerically and token-for-token equivalent to
what a reference checkpoint would produce.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# module tree (state-dict names must match the reference checkpoints)
# ---------------------------------------------------------------------------


class SequenceSE(nn.Module):
    """1D squeeze-excitation over height-pooled columns (se_model.py:8-30)."""

    def __init__(self, channels, reduction=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Conv1d(channels, channels // reduction, kernel_size=1),
            nn.ReLU(inplace=True),
            nn.Conv1d(channels // reduction, channels, kernel_size=1),
            nn.Sigmoid(),
        )

    def forward(self, x):
        b, c, h, w = x.size()
        y = torch.mean(x, dim=2).view(b, c, w)
        y = self.fc(y).view(b, c, 1, w)
        return x * y


def _cbr(cin, cout):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1), nn.BatchNorm2d(cout), nn.ReLU(True))


class SEVGGBackbone(nn.Module):
    """ImprovedFeatureExtractor (se_model.py:35-79)."""

    def __init__(self):
        super().__init__()
        self.conv1, self.pool1 = _cbr(1, 64), nn.MaxPool2d(2, 2)
        self.conv2, self.pool2 = _cbr(64, 128), nn.MaxPool2d(2, 2)
        self.conv3, self.conv4 = _cbr(128, 256), _cbr(256, 256)
        self.se3 = SequenceSE(256)
        self.pool3 = nn.MaxPool2d(kernel_size=(2, 1), stride=(2, 1))
        self.conv5, self.conv6 = _cbr(256, 512), _cbr(512, 512)
        self.se4 = SequenceSE(512)
        self.pool4 = nn.MaxPool2d(kernel_size=(2, 1), stride=(2, 1))
        self.conv7 = nn.Conv2d(512, 512, 3, 1, 1)
        self.bn7 = nn.BatchNorm2d(512)
        self.relu7 = nn.ReLU(True)
        self.se5 = SequenceSE(512)
        self.final_pool = nn.AdaptiveAvgPool2d((2, 32))

    def forward(self, x):
        x = self.pool1(self.conv1(x))
        x = self.pool2(self.conv2(x))
        x = self.se3(self.conv4(self.conv3(x)))
        x = self.pool3(x)
        x = self.se4(self.conv6(self.conv5(x)))
        x = self.pool4(x)
        x = self.se5(self.relu7(self.bn7(self.conv7(x))))
        return self.final_pool(x)


class VGGBackbone(nn.Module):
    """vgg_model.py:5-59 — same trail, no SE, plain conv7."""

    def __init__(self):
        super().__init__()
        self.conv1, self.pool1 = _cbr(1, 64), nn.MaxPool2d(2, 2)
        self.conv2, self.pool2 = _cbr(64, 128), nn.MaxPool2d(2, 2)
        self.conv3, self.conv4 = _cbr(128, 256), _cbr(256, 256)
        self.pool3 = nn.MaxPool2d(kernel_size=(2, 1), stride=(2, 1))
        self.conv5, self.conv6 = _cbr(256, 512), _cbr(512, 512)
        self.pool4 = nn.MaxPool2d(kernel_size=(2, 1), stride=(2, 1))
        self.conv7 = nn.Conv2d(512, 512, 3, 1, 1)
        self.final_pool = nn.AdaptiveAvgPool2d((2, 32))

    def forward(self, x):
        x = self.pool1(self.conv1(x))
        x = self.pool2(self.conv2(x))
        x = self.pool3(self.conv4(self.conv3(x)))
        x = self.pool4(self.conv6(self.conv5(x)))
        return self.final_pool(self.conv7(x))


class BasicBlock(nn.Module):
    """resnet_model.py:5-35."""

    def __init__(self, in_planes, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.shortcut = nn.Sequential()
        if in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, 1, bias=False), nn.BatchNorm2d(planes)
            )

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return self.relu(out)


class ResNetBackbone(nn.Module):
    """resnet_model.py:37-91."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.pool1 = nn.MaxPool2d(2, 2)
        self.layer1 = nn.Sequential(BasicBlock(64, 128))
        self.pool2 = nn.MaxPool2d(2, 2)
        self.layer2 = nn.Sequential(BasicBlock(128, 256), BasicBlock(256, 256))
        self.pool3 = nn.MaxPool2d(kernel_size=(2, 1), stride=(2, 1))
        self.layer3 = nn.Sequential(BasicBlock(256, 512), BasicBlock(512, 512))
        self.pool4 = nn.MaxPool2d(kernel_size=(2, 1), stride=(2, 1))
        self.layer4 = nn.Sequential(BasicBlock(512, 512))
        self.final_pool = nn.AdaptiveAvgPool2d((2, 32))

    def forward(self, x):
        x = self.pool1(self.relu(self.bn1(self.conv1(x))))
        x = self.pool2(self.layer1(x))
        x = self.pool3(self.layer2(x))
        x = self.pool4(self.layer3(x))
        return self.final_pool(self.layer4(x))


class PatchEncoder(nn.Module):
    """se_model.py:81-117."""

    def __init__(self, in_channels, emb_dim, k1=2, k2=1, max_patches=256):
        super().__init__()
        self.proj = nn.Conv2d(in_channels, emb_dim, kernel_size=(k1, k2), stride=(k1, k2))
        self.pos_emb = nn.Parameter(torch.zeros(max_patches, emb_dim))
        nn.init.trunc_normal_(self.pos_emb, std=0.02)

    def forward(self, f):
        x = self.proj(f)
        n = x.shape[2] * x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        return x + self.pos_emb[:n].unsqueeze(0), n


class TransformerDecoderWrapper(nn.Module):
    """se_model.py:162-208."""

    def __init__(self, vocab_size, emb_dim, nhead=8, num_layers=2, pad_idx=0, max_len=256):
        super().__init__()
        self.tok_emb = nn.Embedding(vocab_size, emb_dim, padding_idx=pad_idx)
        dec_layer = nn.TransformerDecoderLayer(
            d_model=emb_dim, nhead=nhead, dim_feedforward=emb_dim * 4, dropout=0.1
        )
        self.decoder = nn.TransformerDecoder(dec_layer, num_layers=num_layers)
        self.pos_emb = nn.Parameter(torch.zeros(max_len, emb_dim))
        nn.init.trunc_normal_(self.pos_emb, std=0.1)
        self.out_proj = nn.Linear(emb_dim, vocab_size)
        self.pad_idx = pad_idx

    def forward(self, tgt_tokens, memory, memory_key_padding_mask):
        b, t = tgt_tokens.size()
        tok = self.tok_emb(tgt_tokens)
        pos = self.pos_emb[:t, :].unsqueeze(0).expand(b, -1, -1)
        tgt = (tok + pos).transpose(0, 1)
        tgt_key_padding_mask = tgt_tokens == self.pad_idx
        causal = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
        dec_out = self.decoder(
            tgt,
            memory.transpose(0, 1),
            tgt_mask=causal,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=(
                memory_key_padding_mask.bool() if memory_key_padding_mask is not None else None
            ),
        )
        return self.out_proj(dec_out.transpose(0, 1))


_BACKBONES = {"se_vgg": SEVGGBackbone, "vgg": VGGBackbone, "resnet": ResNetBackbone}


class KhmerOCR(nn.Module):
    """Top-level oracle (se_model.py:210-288), parameter names match checkpoints."""

    def __init__(self, vocab_size=124, pad_idx=0, emb_dim=384, max_global_len=4096, backbone="se_vgg"):
        super().__init__()
        self.cnn = _BACKBONES[backbone]()
        self.patch = PatchEncoder(512, emb_dim=emb_dim, k1=2, k2=1)
        enc_layer = nn.TransformerEncoderLayer(
            d_model=emb_dim, nhead=8, dim_feedforward=1024, dropout=0.1, activation="relu"
        )
        self.enc = nn.TransformerEncoder(enc_layer, num_layers=2)
        self.global_pos = nn.Parameter(torch.zeros(max_global_len, emb_dim))
        nn.init.trunc_normal_(self.global_pos, std=0.02)
        if backbone == "se_vgg":
            self.context_bilstm = nn.LSTM(
                input_size=emb_dim, hidden_size=emb_dim // 2, num_layers=1,
                batch_first=True, bidirectional=True,
            )
        self.dec = TransformerDecoderWrapper(vocab_size, emb_dim=emb_dim, nhead=8, num_layers=2, pad_idx=pad_idx)
        self.pad_idx = pad_idx


# ---------------------------------------------------------------------------
# eager reference inference paths (predictor.py)
# ---------------------------------------------------------------------------


@torch.no_grad()
def oracle_encode(model: KhmerOCR, chunks: torch.Tensor) -> torch.Tensor:
    """Piecewise encode of ONE image's (N, 1, 48, 100) chunks -> (1, N*32, D),
    mirroring predictor.predict (predictor.py:53-78)."""
    f = model.cnn(chunks)
    p, _ = model.patch(f)
    enc_out = model.enc(p.transpose(0, 1).contiguous()).transpose(0, 1)
    n, l, d = enc_out.shape
    merged = enc_out.reshape(1, n * l, d)
    t = merged.shape[1]
    limit = min(t, model.global_pos.size(0))
    pos = model.global_pos[:limit, :].unsqueeze(0)
    merged = merged[:, :limit, :] + pos if t > limit else merged + pos
    if hasattr(model, "context_bilstm"):
        memory, _ = model.context_bilstm(merged)
    else:
        memory = merged
    return memory


@torch.no_grad()
def oracle_greedy(model: KhmerOCR, memory: torch.Tensor, sos=2, eos=3, max_len=256) -> list[int]:
    """predictor._greedy_decode (predictor.py:85-99)."""
    b, t, _ = memory.shape
    mask = torch.zeros((b, t), dtype=torch.bool)
    generated = [sos]
    for _ in range(max_len):
        tgt = torch.tensor([generated], dtype=torch.long)
        logits = model.dec(tgt, memory, mask)
        nxt = int(torch.argmax(logits[0, -1, :]).item())
        if nxt == eos:
            break
        generated.append(nxt)
    return generated


@torch.no_grad()
def oracle_beam(model: KhmerOCR, memory: torch.Tensor, beam_width=3, sos=2, eos=3, max_len=256) -> list[int]:
    """predictor._beam_search (predictor.py:101-136)."""
    b, t, d = memory.shape
    memory = memory.expand(beam_width, -1, -1)
    mask = torch.zeros((beam_width, t), dtype=torch.bool)
    beams = [(0.0, [sos])]
    completed = []
    for _ in range(max_len):
        k_curr = len(beams)
        tgt = torch.tensor([s for _, s in beams], dtype=torch.long)
        logits = model.dec(tgt, memory[:k_curr], mask[:k_curr])
        log_probs = F.log_softmax(logits[:, -1, :], dim=-1)
        candidates = []
        for i in range(k_curr):
            score, seq = beams[i]
            top_probs, top_idxs = log_probs[i].topk(beam_width)
            for k in range(beam_width):
                candidates.append((score + top_probs[k].item(), seq + [int(top_idxs[k].item())]))
        candidates.sort(key=lambda x: x[0], reverse=True)
        next_beams = []
        for s, seq in candidates:
            if seq[-1] == eos:
                completed.append((s / len(seq), seq))
            elif len(next_beams) < beam_width:
                next_beams.append((s, seq))
        beams = next_beams
        if not beams:
            break
    if completed:
        return sorted(completed, key=lambda x: x[0], reverse=True)[0][1]
    return beams[0][1]


def chunk_image_torch(img: torch.Tensor, chunk_width=100, overlap=16) -> list[torch.Tensor]:
    """Reference chunker (preprocessor.py:16-33): while-loop slicing + white pad."""
    _, _, w = img.shape
    chunks, start = [], 0
    while start < w:
        end = min(start + chunk_width, w)
        chunk = img[:, :, start:end]
        if chunk.shape[2] < chunk_width:
            chunk = F.pad(chunk, (0, chunk_width - chunk.shape[2]), value=1.0)
        chunks.append(chunk)
        start += chunk_width - overlap
    return chunks

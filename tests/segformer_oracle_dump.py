"""Torch-only SegFormer oracle dump (subprocess; never imports JAX).

Builds a randomly initialized HF `SegformerForSemanticSegmentation` (mit-b0
geometry, 12 labels — matching det-b0/config.json) and records its state dict
plus logits for a fixed input. Usage: python segformer_oracle_dump.py <out.npz>
"""

from __future__ import annotations

import sys

import numpy as np
import torch
from transformers import SegformerConfig, SegformerForSemanticSegmentation

ID2LABEL = {i: n for i, n in enumerate(
    ["Background", "Caption", "Footnote", "Formula", "List-item", "Page-footer",
     "Page-header", "Picture", "Section-header", "Table", "Text", "Title"])}


def main(out_path: str) -> None:
    torch.manual_seed(0)
    cfg = SegformerConfig(
        num_labels=12,
        depths=[2, 2, 2, 2],
        hidden_sizes=[32, 64, 160, 256],
        num_attention_heads=[1, 2, 5, 8],
        sr_ratios=[8, 4, 2, 1],
        decoder_hidden_size=256,
        id2label=ID2LABEL,
        label2id={v: k for k, v in ID2LABEL.items()},
    )
    model = SegformerForSemanticSegmentation(cfg)
    model.eval()
    # non-trivial decode-head BN stats
    bn = model.decode_head.batch_norm
    gen = torch.Generator().manual_seed(1)
    bn.running_mean.copy_(torch.randn(bn.num_features, generator=gen) * 0.2)
    bn.running_var.copy_(torch.rand(bn.num_features, generator=gen) + 0.5)

    x = np.random.RandomState(2).randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        logits = model(torch.from_numpy(x)).logits.numpy()  # (1, 12, 32, 32)
        up = torch.nn.functional.interpolate(
            torch.from_numpy(logits), size=(97, 113), mode="bilinear", align_corners=False
        ).numpy()

    blobs = {f"sd/{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    blobs.update(x=x, logits=logits, upsampled=up)
    np.savez_compressed(out_path, **blobs)
    print(f"segformer oracle -> {out_path} ({len(blobs)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1])

"""Beam-3 decode perf with REAL (trained) weights: early exit engaged.

The driver bench (bench.py) uses random weights, so beams never complete and
decode always runs the full 64 steps — a deliberate, conservative worst case
(round-3 VERDICT weak #6: the real-weight early-exit interaction had no perf
evidence). This measures the other end: a TRAINED checkpoint decoding real
rendered Khmer lines, where each line finishes in ~len(text)+1 steps and
beam's provably-safe early exit truncates the `lax.while_loop` on device.

    python examples/bench_real_weights.py --ckpt /root/rw_run/ckpts/epoch015 \
        [--n 256] [--max-len 64]

Reports, for the same encoded memory batch: device ms/decode and lines/s with
the trained weights (early exit live) vs random weights (the worst case the
driver bench reports), plus the mean/max emitted token length and decoded-text
sanity samples.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig, OCRConfig
from khmer_ocr_tpu.data.generator import DocumentTextGenerator
from khmer_ocr_tpu.decode import beam_decode
from khmer_ocr_tpu.models.layers import Ctx
from khmer_ocr_tpu.models.ocr_model import encode, init_model
from khmer_ocr_tpu.preprocess import Preprocessor
from khmer_ocr_tpu.tokenizer import Tokenizer
from khmer_ocr_tpu.train.checkpoint import load_checkpoint
from khmer_ocr_tpu.utils.cache import enable_compilation_cache

R_LO, R_HI = 2, 10


def _slope_ms_per_decode(dec_fn, params, mem, pad) -> float:
    times = {}
    for rep in (R_LO, R_HI):
        def fn(p, m, pd, _rep=rep):
            def body(i, acc):
                t = dec_fn(p, m, pd)
                return acc + t[(i % t.shape[0]).astype(jnp.int32), -1].astype(jnp.int32)

            return jax.lax.fori_loop(0, _rep, body, jnp.int32(0))

        jfn = jax.jit(fn)
        np.asarray(jfn(params, mem, pad))  # compile + warm
        times[rep] = min(_timed(jfn, params, mem, pad) for _ in range(3))
    return (times[R_HI] - times[R_LO]) / (R_HI - R_LO) * 1e3


def _timed(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True, help="Orbax checkpoint dir (train/checkpoint.py)")
    p.add_argument("--n", type=int, default=256, help="rendered lines per batch")
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--beam", type=int, default=3)
    p.add_argument("--words", type=int, default=0,
                   help="truncate the generator vocabulary to N words (0 = full corpus); "
                        "match the checkpoint's training vocab, e.g. train_synthetic_demo "
                        "--words 300 -> --words 300 here")
    p.add_argument("--max-words", type=int, default=6, help="words per rendered line (upper)")
    args = p.parse_args()

    enable_compilation_cache()
    params, stats, mcfg = load_checkpoint(args.ckpt)
    dtype = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, t)
    params, stats = cast(params), cast(stats)
    tok = Tokenizer()

    # real rendered lines, same generator family the reference trains on
    gen = DocumentTextGenerator(seed=123, augment=False,
                                words_per_sample=(1, args.max_words))
    if args.words:
        gen.words = gen.words[: args.words]  # mirror train_synthetic_demo's closed vocab
    samples = gen.generate(args.n * 2, processes=1)  # extra: buckets split them
    from PIL import Image

    imgs = [Image.fromarray(img) for img, _ in samples]
    texts = [t for _, t in samples]

    # pre-chunked float payload (encode()'s input layout) — the uint8-lines
    # fast path is a Predictor-internal transfer optimization, not relevant to
    # this device-time measurement
    import dataclasses

    runtime = dataclasses.replace(OCRConfig().runtime,
                                  transfer_uint8=False, transfer_lines=False)
    pre = Preprocessor(OCRConfig().preprocess, runtime)
    batches = list(pre.iter_batches(imgs, max_batch=args.n))
    big = max(batches, key=lambda b: len(b.indices))
    print(f"bucket: {len(big.indices)} lines x {big.bucket_n} chunks", flush=True)

    ctx = Ctx(num_heads=mcfg.num_heads, dropout=0.0, deterministic=True)
    enc = jax.jit(lambda p, s, c, n: encode(p, s, c, n, mcfg, ctx)[:2])
    chunks = jnp.asarray(big.chunks, dtype)
    counts = jnp.asarray(big.chunk_counts)
    memory, pad = enc(params, stats, chunks, counts)
    memory = jax.block_until_ready(memory)

    dc = DecodeConfig(beam_width=args.beam, max_len=args.max_len)
    dec = lambda p, m, pd: beam_decode(p, m, pd, mcfg, dc)

    # sanity: the trained model must actually emit <eos> (else this measures
    # the same worst case as bench.py and the comparison is meaningless)
    toks = np.asarray(jax.jit(dec)(params, memory, pad))
    lengths = (toks != tok.pad_idx).sum(axis=1)
    hyp = tok.decode_batch(toks)
    ref = [texts[i] for i in big.indices]
    exact = sum(h == r for h, r in zip(hyp, ref)) / len(ref)
    print(f"emitted len mean {lengths.mean():.1f} / max {lengths.max()} "
          f"(cap {args.max_len}); exact-match {exact:.2f}", flush=True)
    for h, r in list(zip(hyp, ref))[:3]:
        print(f"  ref={r!r}\n  hyp={h!r}", flush=True)
    if lengths.max() >= args.max_len - 1:
        print("WARNING: some lines hit the cap — early exit partially engaged only",
              flush=True)

    ms_real = _slope_ms_per_decode(dec, params, memory, pad)
    b = memory.shape[0]
    print(f"TRAINED weights : {ms_real:7.2f} ms/decode  {b / ms_real * 1e3:7.0f} lines/s "
          f"(early exit live)", flush=True)

    rnd, _ = init_model(jax.random.PRNGKey(0), mcfg)
    rnd = cast(rnd)
    ms_rand = _slope_ms_per_decode(dec, rnd, memory, pad)
    print(f"RANDOM weights  : {ms_rand:7.2f} ms/decode  {b / ms_rand * 1e3:7.0f} lines/s "
          f"(the driver-bench worst case)", flush=True)
    print(f"early-exit speedup on this workload: {ms_rand / ms_real:.2f}x", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: batched text-line recognition throughput.

Prints ONE JSON line whose primary metric is the PUBLISHED-CER configuration —
beam-3 decode over a mixed chunk-bucket workload (the reference evaluates at
beam width 3, CNN-Transformer.ipynb [cell 19]) — plus secondary rows:
  * greedy_lines_per_sec: round-1-comparable easy config (B=256, 4-chunk, greedy)
  * e2e_lines_per_sec: images-in -> strings-out including host preprocessing
    (PIL resize + chunk + bucket) through the public Predictor path

The reference publishes no throughput numbers (BASELINE.md) — its decode loop
is per-image Python with no KV cache. The driver-set north star is >= 5000
text-line images/sec on a v5e-8; vs_baseline compares the beam-3 device rate
against the pro-rated per-chip share (5000/8 per visible chip).

Decode runs the full 64 steps (random weights rarely emit <eos>, and beam's
early exit never fires without completions) — a conservative worst case; real
checkpoints finish lines in fewer steps and exit earlier.

RESILIENCE (round-3 postmortem): round 3's driver bench died with rc=1 on a
TPU ``FailedPrecondition`` at the very first device fetch — transient device/
tunnel state (the identical code benched clean in round 4: 4453 lines/s).
To make one bad device state unable to erase a round's perf evidence, every
row now runs in its OWN subprocess with up to three attempts:
  1. default environment;
  2. after a 60 s heal wait (the axon tunnel needs ~1-2 min with no clients
     after a wedge), with the persistent XLA compile cache DISABLED — rules
     out a stale cached executable replaying into bad device state;
  3. (primary row only) additionally with KHMER_OCR_FUSED_DECODE=0 — rules
     out the Pallas kernel itself.
The final JSON line always prints with whatever rows succeeded plus an
``errors`` field; exit code is 0 iff the PRIMARY (beam-3) row succeeded.

Flags: --trace DIR captures a jax.profiler trace of the beam-3 run.
       --smoke runs every row at tiny shapes (CI / virtual-mesh validation:
         XLA_FLAGS=--xla_force_host_platform_device_count=8 exercises the
         n_dev>1 sharded branch without TPU hardware).
       --row NAME --inner runs one row in-process (the orchestrator's child).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

STEPS = 64  # typical text line is ~40-60 chars
PER_CHIP_TARGET = 5000.0 / 8.0  # north-star v5e-8 pro-rated per chip
# first-party trained checkpoint persisted in-repo (examples/persist_checkpoint.py);
# when present, the 'real' row reports beam-3 WITH early exit live + a CER gate
REAL_CKPT = Path(__file__).resolve().parent / "checkpoints" / "se_vgg_flagship"


def _rand_chunks(rng, b, n, dtype):
    import jax.numpy as jnp

    arr = rng.uniform(-1, 1, (b, n, 48, 100)).astype(np.float32)
    return jnp.asarray(arr, dtype=dtype)


def bench_device(params, stats, cfg, dtype, beam_width: int, batches, mesh=None):
    """batches: list of (B, n_chunks). Returns lines/sec. The whole mixed-bucket
    sweep runs as ONE compiled program per iteration (host dispatch on the axon
    runtime costs ~25-30 ms per program call — per-bucket dispatch would
    dominate), iterations are enqueued back-to-back, and all results drain at
    the end (on the axon remote client only a device->host fetch truly
    synchronizes). With ``mesh`` (n_devices > 1) every batch SHARDS over the
    data axis — the work divides across chips instead of only rescaling the
    single-chip target (round-2 VERDICT weak #4)."""
    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.config import DecodeConfig
    from khmer_ocr_tpu.infer.predictor import _infer_multi_jit

    rng = np.random.RandomState(0)
    dec_cfg = DecodeConfig(beam_width=beam_width, max_len=STEPS)
    inputs = tuple(
        (_rand_chunks(rng, b, n, dtype), jnp.full((b,), n, jnp.int32)) for b, n in batches
    )
    if mesh is not None:
        from khmer_ocr_tpu.parallel.mesh import batch_sharding

        inputs = tuple(
            (jax.device_put(c, batch_sharding(mesh, c.ndim)),
             jax.device_put(n, batch_sharding(mesh, 1)))
            for c, n in inputs
        )

    def run_all():
        return _infer_multi_jit(params, stats, inputs, cfg, dec_cfg, beam_width > 1, "default")

    for o in run_all():
        np.asarray(o)  # compile + warm every shape

    n_iters = 6
    total_lines = sum(b for b, _ in batches) * n_iters
    t0 = time.perf_counter()
    outs = []
    for _ in range(n_iters):
        outs.extend(run_all())
    for o in outs:
        np.asarray(o)
    return total_lines / (time.perf_counter() - t0)


def bench_end_to_end(params, stats, cfg, n_images: int = 768, beam_width: int = 3, mesh=None,
                     flush_deadline_ms: float = 0.0):
    """image FILES in -> strings out through the public Predictor (native C++
    decode+resize loader, bucketing, device decode), on rendered Khmer lines
    saved to disk — the realistic serving input.

    ``flush_deadline_ms`` > 0 enables the partial-bucket deadline flush
    (RuntimeConfig.flush_deadline_ms) for A/B'ing prep/device overlap."""
    import dataclasses
    import tempfile
    from pathlib import Path

    from khmer_ocr_tpu.config import OCRConfig
    from khmer_ocr_tpu.data.generator import DocumentTextGenerator
    from khmer_ocr_tpu.infer.predictor import Predictor

    from PIL import Image

    # corpus_path="none": keep the synthetic-word width distribution this row
    # has used since round 1 (the packaged real-Khmer corpus seed produces
    # longer lines / bigger chunk buckets and would shift the workload)
    gen = DocumentTextGenerator(seed=3, augment=False, words_per_sample=(1, 6),
                                corpus_path="none")
    samples = gen.generate(n_images, processes=1)
    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    images = []
    for i, (img, _) in enumerate(samples):
        p = tmp / f"{i}.png"
        Image.fromarray(img).save(p)
        images.append(str(p))

    config = OCRConfig()
    if flush_deadline_ms:
        config = config.replace(
            runtime=dataclasses.replace(config.runtime, flush_deadline_ms=flush_deadline_ms))
    predictor = Predictor(params=params, batch_stats=stats, model_cfg=cfg, config=config,
                          mesh=mesh)
    # two full warm passes: every (chunk-bucket, batch-bucket) shape this
    # workload hits compiles on the first, and every group COMBO — which only
    # compiles on its second sighting — on the second (persistent-cached)
    for _ in range(2):
        predictor.predict_batch(images, beam_width=beam_width, batch_size=256, max_len=STEPS)

    # median of 3 passes: the axon-tunneled host/transfer path is noisy
    # (+-30% pass to pass); a single pass under-/over-reports by the draw
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        texts = predictor.predict_batch(images, beam_width=beam_width, batch_size=256, max_len=STEPS)
        dt = time.perf_counter() - t0
        assert len(texts) == n_images
        rates.append(n_images / dt)
    rates.sort()
    return rates[1]


def bench_document(params, stats, cfg, n_pages: int = 12, beam_width: int = 3,
                   lines_per_page: int = 18):
    """Full document pipeline pages/s through the PIPELINED multi-page path
    (pipeline/engine.py::process_pages) — the product surface the netra_ocr
    CLI serves (reference ocr_engine.py:37-102, strictly sequential there).
    Per page: the real SegFormer device forward + host upsample, then the CV
    postprocess on a REALISTIC class map painted from the page's known line
    geometry (random weights emit noise maps whose thousands of spurious
    contours make postprocess ~100x slower than on any real page — that cost
    would be an artifact), then the line crops batch-recognize at beam 3.
    Detection of page N+1 overlaps recognition of page N on the worker
    thread. Returns (pages/s, lines/s)."""
    import tempfile

    import jax
    from PIL import Image

    from khmer_ocr_tpu.config import OCRConfig
    from khmer_ocr_tpu.data.generator import DocumentTextGenerator
    from khmer_ocr_tpu.detection.detector import LayoutInference
    from khmer_ocr_tpu.detection.train import segformer_init
    from khmer_ocr_tpu.infer.predictor import Predictor

    rng = np.random.RandomState(11)
    gen = DocumentTextGenerator(seed=11, augment=False, words_per_sample=(2, 6),
                                corpus_path="none")
    samples = gen.generate(n_pages * lines_per_page, processes=1)
    page_w, page_h, margin, gap = 1240, 1754, 90, 12
    tmp = Path(tempfile.mkdtemp(prefix="bench_doc_"))
    pages, boxes_per_page = [], []
    si = 0
    for pg in range(n_pages):
        page = np.full((page_h, page_w), 255, np.uint8)
        y = margin
        boxes = []
        for _ in range(lines_per_page):
            img = samples[si][0]
            si += 1
            h, w = img.shape
            w = min(w, page_w - 2 * margin)
            x = margin + rng.randint(0, max(page_w - 2 * margin - w, 1))
            if y + h > page_h - margin:
                break
            page[y : y + h, x : x + w] = img[:, :w]
            boxes.append((x, y, x + w, y + h))
            y += h + gap
        p = tmp / f"page{pg}.png"
        Image.fromarray(page).save(p)
        pages.append(p)
        boxes_per_page.append(boxes)

    detector = LayoutInference(model_dir=None, params=segformer_init(jax.random.PRNGKey(0)))
    predictor = Predictor(params=params, batch_stats=stats, model_cfg=cfg, config=OCRConfig())

    from khmer_ocr_tpu.detection.postprocess import extract_layout_elements
    from khmer_ocr_tpu.pipeline.engine import KhmerOCRPipeline

    boxes_by_page = {str(p): b for p, b in zip(pages, boxes_per_page)}

    pipe = KhmerOCRPipeline.__new__(KhmerOCRPipeline)
    pipe.engine = "custom"
    pipe.recognizer_model_path = pipe.vocab_path = None
    pipe.recognize_fn = lambda crops, beam_width, batch_size, model_path, vocab_path: (
        predictor.predict_batch(crops, beam_width=beam_width, batch_size=batch_size,
                                max_len=STEPS)
    )

    def detect_crops_batch(page_paths, padding):
        # real BATCHED device forwards + model-resolution transfers
        # (detection/detector.py::predict_maps_batch), painted class maps
        # (random weights emit noise maps — see docstring), real CV postprocess.
        # Pages decode ONCE (PIL) and the same image feeds both the device
        # prep and the line crops — the engine's real path does the same.
        pages_pil = [Image.open(p) for p in page_paths]
        out = []
        for page_path, page_img, (image, cm, hm) in zip(
                page_paths, pages_pil, detector.predict_maps_batch(pages_pil)):
            boxes = boxes_by_page[str(page_path)]
            cm = np.zeros_like(cm)
            hm = np.full_like(hm, 0.9)
            for (x0, y0, x1, y1) in boxes:
                cm[y0:y1, x0:x1] = 10  # DocLayNet "Text"
            extract_layout_elements(image, cm, hm, detector.cfg)  # real CV postprocess
            out.append([np.asarray(page_img.crop(b).convert("L")) for b in boxes])
        return out

    pipe._detect_crops_batch = detect_crops_batch

    # two full warm passes over the REAL page set (the e2e methodology): the
    # first compiles every single-bucket program the workload hits, the second
    # the group combos (a combo only compiles once it repeats)
    for _ in range(2):
        pipe.process_pages(pages, beam_width=beam_width, batch_size=64)
    n_lines = sum(len(b) for b in boxes_per_page)
    # median of 3: the CV postprocess + detection share the host core with
    # dispatch, making single passes swing ~2x (observed 1.7-3.3 pages/s)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        texts = pipe.process_pages(pages, beam_width=beam_width, batch_size=64)
        dt = time.perf_counter() - t0
        assert len(texts) == n_pages
        rates.append((n_pages / dt, n_lines / dt))
    rates.sort()
    return rates[1]


def bench_real_weights(beam_width: int = 3, max_len: int = 64, n_lines: int = 512):
    """Beam-3 device rate with the TRAINED in-repo checkpoint: early exit live.

    Every other row uses random weights (decode always runs all STEPS — the
    conservative worst case). This row decodes real rendered Khmer lines with
    the persisted flagship weights, where lines finish in ~len(text)+1 steps
    and the provably-safe early exit truncates the while_loop on device
    (decode/beam.py). Also reports CER on those lines — a per-round accuracy
    regression gate riding along with the perf row (round-4 VERDICT #3).
    Returns (lines_per_sec, cer_pct, emitted_len_mean)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.config import DecodeConfig, OCRConfig
    from khmer_ocr_tpu.data.generator import DocumentTextGenerator
    from khmer_ocr_tpu.decode import beam_decode
    from khmer_ocr_tpu.metrics import calculate_cer
    from khmer_ocr_tpu.models.layers import Ctx
    from khmer_ocr_tpu.models.ocr_model import encode
    from khmer_ocr_tpu.preprocess import Preprocessor
    from khmer_ocr_tpu.tokenizer import Tokenizer
    from khmer_ocr_tpu.train.checkpoint import load_checkpoint

    params, stats, mcfg = load_checkpoint(REAL_CKPT)
    cast = lambda t: jax.tree.map(
        lambda v: jnp.asarray(v, jnp.bfloat16) if np.asarray(v).dtype in (np.float32,) else jnp.asarray(v), t)
    params, stats = cast(params), cast(stats)
    tok = Tokenizer()

    from PIL import Image

    gen = DocumentTextGenerator(seed=123, augment=False, words_per_sample=(2, 6))
    samples = gen.generate(n_lines + n_lines // 4, processes=1)
    # lines longer than the decode budget would report truncation, not model
    # quality — keep the CER gate measuring the checkpoint (~3% of (2,6)-word
    # lines exceed 64 tokens; verified max_len=128 decodes them at 0 CER)
    samples = [s for s in samples if len(tok.encode(s[1])) <= max_len - 4][:n_lines]
    runtime = dataclasses.replace(OCRConfig().runtime, transfer_uint8=False, transfer_lines=False)
    pre = Preprocessor(OCRConfig().preprocess, runtime)
    batches = list(pre.iter_batches([Image.fromarray(img) for img, _ in samples],
                                    max_batch=n_lines))
    big = max(batches, key=lambda b: len(b.indices))

    ctx = Ctx(num_heads=mcfg.num_heads, dropout=0.0, deterministic=True)
    enc = jax.jit(lambda p, s, c, n: encode(p, s, c, n, mcfg, ctx)[:2])
    memory, pad = enc(params, stats, jnp.asarray(big.chunks, jnp.bfloat16),
                      jnp.asarray(big.chunk_counts))
    memory = jax.block_until_ready(memory)

    dc = DecodeConfig(beam_width=beam_width, max_len=max_len)
    dec = lambda p, m, pd: beam_decode(p, m, pd, mcfg, dc)
    toks = np.asarray(jax.jit(dec)(params, memory, pad))
    hyp = tok.decode_batch(toks)
    refs = [samples[i][1] for i in big.indices]
    cer = float(np.mean([calculate_cer(r, h) for r, h in zip(refs, hyp)])) * 100.0
    emitted = float((toks != tok.pad_idx).sum(axis=1).mean())

    # slope method with a loop-carried input perturbation (LICM guard)
    def make(rep):
        def fn(p, m, pd):
            def body(i, acc):
                t = dec(p, m + (acc * 0).astype(m.dtype), pd)
                return acc + t[(i % t.shape[0]).astype(jnp.int32), -1].astype(jnp.int32)

            return jax.lax.fori_loop(0, rep, body, jnp.int32(0))

        return jax.jit(fn)

    times = {}
    for rep in (2, 10):
        fn = make(rep)
        np.asarray(fn(params, memory, pad))
        times[rep] = min(_walltime(fn, params, memory, pad) for _ in range(3))
    per_decode = (times[10] - times[2]) / 8.0
    # early-exit decodes are sub-ms; a non-positive slope means host-timing
    # noise swamped the device time (seen on contended CPU smoke) — report 0
    # rather than a nonsense rate. The CER/emitted fields stay valid.
    if per_decode <= 1e-6:
        return 0.0, cer, emitted
    return memory.shape[0] / per_decode, cer, emitted


def bench_train(cfg, batch_size: int = 32, n_chunks: int = 4, label_len: int = 48, mesh=None,
                reps=(2, 8)):
    """Training throughput: reference-recipe step (Adam, masked CE, teacher
    forcing, batch 32, CNN-Transformer.ipynb [cell 17]) repeated inside one
    jitted fori_loop (the carried TrainState makes iterations truly
    sequential, so the slope between two repeat counts is pure device time)."""
    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.train.step import init_train_state, make_optimizer, make_train_step

    opt = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, precision="default", donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "chunks": jnp.asarray(rng.uniform(-1, 1, (batch_size, n_chunks, 48, 100)).astype(np.float32)),
        "chunk_counts": jnp.full((batch_size,), n_chunks, jnp.int32),
        "labels": jnp.asarray(
            np.concatenate(
                [
                    np.full((batch_size, 1), 2, np.int64),  # <sos>
                    rng.randint(4, cfg.vocab_size, (batch_size, label_len - 2)),
                    np.full((batch_size, 1), 3, np.int64),  # <eos>
                ],
                axis=1,
            ).astype(np.int32)
        ),
    }
    if mesh is not None:
        from khmer_ocr_tpu.parallel.mesh import batch_sharding, replicate

        rep_s = replicate(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rep_s), state)
        batch = {k: jax.device_put(v, batch_sharding(mesh, np.ndim(v))) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    def make(rep):
        def fn(st):
            def body(i, s):
                s2, _ = step(s, batch, jax.random.fold_in(key, i), jnp.float32(1e-4))
                return s2

            out = jax.lax.fori_loop(0, rep, body, st)
            # consume a PARAMETER so the whole grad/update chain stays live
            # (returning only .step lets XLA prune the training compute)
            return jax.tree.leaves(out.params)[0].ravel()[0]

        return jax.jit(fn)

    times = {}
    for rep in reps:
        fn = make(rep)
        np.asarray(fn(state))  # compile
        times[rep] = min(_walltime(fn, state) for _ in range(3))
    per_step = (times[reps[1]] - times[reps[0]]) / (reps[1] - reps[0])
    return batch_size / per_step


def _walltime(fn, *args):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


ROWS = ("greedy", "beam3", "e2e", "doc", "train", "real")
# per-attempt subprocess timeouts (s): generous enough for cold compiles
# (~1 min/TPU shape; a cache-busted retry recompiles everything)
_ROW_TIMEOUT = {"greedy": 1500, "beam3": 2400, "e2e": 1800, "doc": 1500, "train": 1500,
                "real": 1500}


def _setup(smoke: bool):
    """Shared per-row initialization (each row runs in its own process)."""
    import jax
    import jax.numpy as jnp

    from khmer_ocr_tpu.config import ModelConfig
    from khmer_ocr_tpu.models.ocr_model import init_model

    if os.environ.get("KHMER_OCR_NO_COMPILE_CACHE") != "1":
        from khmer_ocr_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()  # each shape compiles once across bench runs

    n_dev = len(jax.devices())
    # smoke mode validates the ORCHESTRATION (rows, retries, the n_dev>1
    # sharded branch) on a virtual CPU mesh, where the flagship model is far
    # too slow for one host core — flagship sharded shapes are separately
    # exercised by __graft_entry__.py::dryrun_multichip on the same mesh
    cfg = (ModelConfig(emb_dim=128, num_heads=4, enc_layers=1, dec_layers=2,
                       enc_ffn_dim=256, max_global_len=512, backbone="vgg",
                       use_bilstm=False)
           if smoke else ModelConfig())
    params, stats = init_model(jax.random.PRNGKey(0), cfg)
    dtype = jnp.bfloat16
    params = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    mesh = None
    if n_dev > 1:
        # multi-chip: shard the work over a pure-DP mesh — params replicate,
        # batches split on the data axis, per-batch B scales with the mesh
        from khmer_ocr_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(n_data=n_dev, n_model=1)
        rep = replicate(mesh)
        params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
        stats = jax.tree.map(lambda x: jax.device_put(x, rep), stats)
    return params, stats, cfg, dtype, mesh, n_dev


def run_row(row: str, smoke: bool, trace: str | None = None) -> dict:
    """Run one bench row in-process and return its result fields."""
    global STEPS
    if smoke:
        STEPS = 8
    params, stats, cfg, dtype, mesh, n_dev = _setup(smoke)
    scale = n_dev  # per-bucket batch grows with the mesh (fixed per-chip share)
    b = (8 if smoke else 256) * scale
    out: dict = {"row": row, "n_devices": n_dev}
    if row == "greedy":
        out["value"] = bench_device(params, stats, cfg, dtype, beam_width=1,
                                    batches=[(b, 4)], mesh=mesh)
    elif row == "beam3":
        from khmer_ocr_tpu.utils.profiling import profile_trace

        mixed = [(b, 1), (b, 2), (b, 4), (b, 8)]
        with profile_trace(trace, enabled=trace is not None):
            out["value"] = bench_device(params, stats, cfg, dtype, beam_width=3,
                                        batches=mixed, mesh=mesh)
    elif row == "e2e":
        out["value"] = bench_end_to_end(params, stats, cfg,
                                        n_images=(32 if smoke else 768) * scale, mesh=mesh)
    elif row == "doc":
        pages, lines = (2, 6) if smoke else (12, 18)
        doc_pages, doc_lines = bench_document(params, stats, cfg, n_pages=pages,
                                              lines_per_page=lines)
        out["value"] = doc_pages
        out["doc_lines_per_sec"] = round(doc_lines, 2)
    elif row == "train":
        out["value"] = bench_train(cfg, batch_size=(1 if smoke else 32) * scale,
                                   n_chunks=(2 if smoke else 4), mesh=mesh,
                                   reps=((1, 3) if smoke else (2, 8)))
    elif row == "real":
        lps, cer, emitted = bench_real_weights(n_lines=64 if smoke else 512)
        out["value"] = lps
        out["real_cer_pct"] = round(cer, 3)
        out["emitted_len_mean"] = round(emitted, 1)
    else:
        raise SystemExit(f"unknown row {row!r}")
    out["value"] = round(out["value"], 2)
    return out


def _parse_last_json(text: str) -> dict | None:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def orchestrate(args) -> int:
    """Run every row in its own subprocess with retry + env fallbacks; always
    print the final JSON line; exit 0 iff the primary (beam3) row succeeded."""
    results: dict = {}
    errors: dict = {}
    skipped: dict = {}
    heal_wait = 5 if args.smoke else 60
    for row in ROWS:
        if row == "real" and not (REAL_CKPT / "state").exists():
            skipped[row] = "no in-repo checkpoint (checkpoints/se_vgg_flagship)"
            continue
        attempts: list[dict] = [{}, {"KHMER_OCR_NO_COMPILE_CACHE": "1"}]
        if row == "beam3":
            attempts.append({"KHMER_OCR_NO_COMPILE_CACHE": "1", "KHMER_OCR_FUSED_DECODE": "0"})
        cmd = [sys.executable, str(Path(__file__).resolve()), "--inner", "--row", row]
        if args.smoke:
            cmd.append("--smoke")
        if args.trace and row == "beam3":
            cmd += ["--trace", args.trace]
        for i, extra_env in enumerate(attempts):
            if i:
                # a wedged axon tunnel needs ~1-2 min with NO clients to heal
                time.sleep(heal_wait)
            env = {**os.environ, **extra_env}
            # smoke validates orchestration mechanics, not perf: cap each
            # attempt so one heavy row (8 virtual devices on few host cores)
            # cannot stall the whole validation
            row_timeout = min(_ROW_TIMEOUT[row], 900) if args.smoke else _ROW_TIMEOUT[row]
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=row_timeout, env=env)
            except subprocess.TimeoutExpired:
                errors[row] = f"attempt {i + 1}: timeout after {row_timeout}s"
                continue
            parsed = _parse_last_json(proc.stdout) if proc.returncode == 0 else None
            if parsed is not None and "value" in parsed:
                if extra_env:
                    parsed["degraded_env"] = sorted(extra_env)
                results[row] = parsed
                errors.pop(row, None)
                break
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            errors[row] = f"attempt {i + 1} rc={proc.returncode}: " + " | ".join(tail[-3:])[-400:]

    beam3 = results.get("beam3")
    n_dev = next((r["n_devices"] for r in results.values()), 1)
    report = {
        "metric": "beam3_ocr_throughput",
        "value": beam3["value"] if beam3 else None,
        "unit": "lines/sec",
        "vs_baseline": (round(beam3["value"] / (PER_CHIP_TARGET * n_dev), 4) if beam3 else None),
        "n_devices": n_dev,
    }
    for row, key in (("greedy", "greedy_lines_per_sec"), ("e2e", "e2e_beam3_lines_per_sec"),
                     ("doc", "doc_pages_per_sec"), ("train", "train_lines_per_sec"),
                     ("real", "real_beam3_lines_per_sec")):
        if row in results:
            report[key] = results[row]["value"]
    if "doc" in results and "doc_lines_per_sec" in results["doc"]:
        report["doc_lines_per_sec"] = results["doc"]["doc_lines_per_sec"]
    if "real" in results:
        report["real_cer_pct"] = results["real"].get("real_cer_pct")
    degraded = {r: v["degraded_env"] for r, v in results.items() if "degraded_env" in v}
    if degraded:
        report["degraded"] = degraded
    if skipped:
        report["skipped"] = skipped
    if errors:
        report["errors"] = errors
    if args.smoke:
        report["smoke"] = True
    print(json.dumps(report))
    sys.stdout.flush()
    return 0 if beam3 else 1


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--trace", default=None, help="Capture a jax.profiler trace of the beam-3 run")
    p.add_argument("--smoke", action="store_true", help="tiny shapes (CI / virtual-mesh check)")
    p.add_argument("--row", choices=ROWS, default=None, help="run a single row")
    p.add_argument("--inner", action="store_true",
                   help="run --row in-process (orchestrator child); prints the row JSON")
    args = p.parse_args()

    if args.inner or args.row:
        row = args.row or "beam3"
        out = run_row(row, smoke=args.smoke, trace=args.trace)
        print(json.dumps(out))
        sys.stdout.flush()
        return

    raise SystemExit(orchestrate(args))


if __name__ == "__main__":
    main()

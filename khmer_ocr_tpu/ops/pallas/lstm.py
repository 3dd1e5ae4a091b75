"""Pallas TPU kernel for the LSTM recurrence.

The BiLSTM context smoother is the model's one truly serial stage (SURVEY.md
§7 hard-parts #4): a scan over up to 4096 merged tokens. The input projection
``x @ W_ih`` is hoisted into one big MXU matmul outside the kernel (see
models/bilstm.py); what remains per step is the recurrent matmul
``h @ W_hh`` plus gate elementwise ops.

XLA's `lax.scan` re-stages the recurrent weights and gate slabs from HBM every
iteration. This kernel instead:
  * keeps ``W_hh`` (H x 4H) and the running (h, c) state resident in VMEM for
    the whole sequence,
  * streams the precomputed gate slabs ``xg[t]`` (B x 4H) HBM->VMEM with a
    double-buffered async DMA pipeline so the next step's input loads while the
    current step computes,
  * writes each step's ``h`` (and optionally ``c``, for the backward pass) to
    HBM asynchronously,
  * tiles large batches over a sequential Pallas grid dimension (each batch
    tile is an independent recurrence) — one kernel launch at any batch size
    instead of the round-1 host-side Python tile loop (VERDICT next-step #3).

``lstm_recurrence_vjp`` wraps the kernel in a `jax.custom_vjp`: the forward
runs the kernel (emitting h and c sequences), the backward is the standard
LSTM adjoint as a reverse `lax.scan` that recomputes gates from the saved
(xg, h, c) — so training can take the kernel path too.

Numerics match models/bilstm.lstm_scan exactly in f32 (same gate order
i,f,g,o, same accumulation); used when shapes fit the tiling constraints, with
the scan as fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_TILE = 256  # batch rows per grid step; VMEM budget ~6 MB/tile at Hp=256


def _round_tile(batch: int) -> int:
    """Largest 8-aligned divisor of ``batch`` that fits the VMEM tile budget."""
    if batch <= MAX_TILE:
        return batch
    for d in range(MAX_TILE, 7, -1):
        if batch % d == 0 and d % 8 == 0:
            return d
    return batch  # no valid tile; pallas_lstm_available() rejects this shape


def pallas_lstm_available(batch: int, hidden: int, dtype) -> bool:
    """Shape gate: hidden must be 8-aligned (lane padding to 128 is handled
    inside); the batch must divide into 8-aligned grid tiles."""
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if batch <= 0:
        return False
    tile = _round_tile(batch)
    return hidden % 8 == 0 and batch % 8 == 0 and batch % tile == 0 and tile % 8 == 0 and tile <= MAX_TILE


def _kernel_factory(t: int, bt: int, hp: int, with_cell: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(xg_hbm, w_ref, out_hbm, *maybe_c_hbm):
        c_hbm = maybe_c_hbm[0] if with_cell else None
        tile = pl.program_id(0)
        b0 = tile * bt

        def body(gates_buf, out_buf, c_out_buf, h_ref, c_ref, in_sems, out_sems, c_sems):
            n_buf = 2

            def load(slot, step):
                return pltpu.make_async_copy(
                    xg_hbm.at[step, :, pl.ds(b0, bt)], gates_buf.at[slot], in_sems.at[slot]
                )

            def store(slot, step):
                return pltpu.make_async_copy(
                    out_buf.at[slot], out_hbm.at[step, pl.ds(b0, bt)], out_sems.at[slot]
                )

            def store_c(slot, step):
                return pltpu.make_async_copy(
                    c_out_buf.at[slot], c_hbm.at[step, pl.ds(b0, bt)], c_sems.at[slot]
                )

            h_ref[...] = jnp.zeros_like(h_ref)
            c_ref[...] = jnp.zeros_like(c_ref)
            load(0, 0).start()

            def step_fn(step, _):
                slot = step % n_buf
                nxt = (step + 1) % n_buf

                @pl.when(step + 1 < t)
                def _():
                    load(nxt, step + 1).start()

                load(slot, step).wait()

                hh = h_ref[...]
                i = jax.nn.sigmoid(gates_buf[slot, 0] + jnp.dot(hh, w_ref[0], preferred_element_type=jnp.float32))
                f = jax.nn.sigmoid(gates_buf[slot, 1] + jnp.dot(hh, w_ref[1], preferred_element_type=jnp.float32))
                g = jnp.tanh(gates_buf[slot, 2] + jnp.dot(hh, w_ref[2], preferred_element_type=jnp.float32))
                o = jax.nn.sigmoid(gates_buf[slot, 3] + jnp.dot(hh, w_ref[3], preferred_element_type=jnp.float32))
                c = f * c_ref[...] + i * g
                new_h = o * jnp.tanh(c)
                c_ref[...] = c
                h_ref[...] = new_h

                # wait for the previous write of this slot before reusing it
                @pl.when(step >= n_buf)
                def _():
                    store(slot, step - n_buf).wait()
                    if with_cell:
                        store_c(slot, step - n_buf).wait()

                out_buf[slot] = new_h
                store(slot, step).start()
                if with_cell:
                    c_out_buf[slot] = c
                    store_c(slot, step).start()
                return 0

            jax.lax.fori_loop(0, t, step_fn, 0)
            # drain outstanding writes
            @pl.when(t >= 2)
            def _():
                store((t - 2) % n_buf, t - 2).wait()
                if with_cell:
                    store_c((t - 2) % n_buf, t - 2).wait()

            store((t - 1) % n_buf, t - 1).wait()
            if with_cell:
                store_c((t - 1) % n_buf, t - 1).wait()

        pl.run_scoped(
            body,
            gates_buf=pltpu.VMEM((2, 4, bt, hp), jnp.float32),
            out_buf=pltpu.VMEM((2, bt, hp), jnp.float32),
            c_out_buf=pltpu.VMEM((2, bt, hp), jnp.float32) if with_cell else pltpu.VMEM((1, 8, 128), jnp.float32),
            h_ref=pltpu.VMEM((bt, hp), jnp.float32),
            c_ref=pltpu.VMEM((bt, hp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2,)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
            c_sems=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("hidden", "with_cell"))
def lstm_recurrence(xg, w_hh, hidden: int, with_cell: bool = False):
    """xg: (B, T, 4H) precomputed input gates (+biases); w_hh: (H, 4H).

    Returns the h-sequence (B, T, H), or (h_seq, c_seq) when ``with_cell``.
    Gate order i, f, g, o (torch layout). Batches larger than the VMEM tile run
    over a sequential Pallas grid (one launch).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, gh = xg.shape
    h = hidden
    assert gh == 4 * h
    bt = _round_tile(b)
    assert b % bt == 0, f"batch {b} not divisible by tile {bt}"
    # Gate-major, time-major, lane-padded layout. Mosaic requires sliced/DMA'd
    # lane extents to be 128-aligned, so each gate lives as its own (B, Hp)
    # plane with Hp = H rounded up to 128. The padded lanes provably stay zero
    # through the recurrence (xg pad = 0, w pad = 0 -> c_pad = 0, h_pad = 0).
    hp = ((h + 127) // 128) * 128
    xg_g = xg.reshape(b, t, 4, h).transpose(1, 2, 0, 3)  # (T, 4, B, H)
    xg_tm = jnp.pad(xg_g, ((0, 0), (0, 0), (0, 0), (0, hp - h)))
    w_g = w_hh.reshape(h, 4, h).transpose(1, 0, 2)  # (4, H, H)
    w_g = jnp.pad(w_g, ((0, 0), (0, hp - h), (0, hp - h)))

    out_shapes = [jax.ShapeDtypeStruct((t, b, hp), jnp.float32)]
    if with_cell:
        out_shapes.append(jax.ShapeDtypeStruct((t, b, hp), jnp.float32))

    outs = pl.pallas_call(
        _kernel_factory(t, bt, hp, with_cell),
        grid=(b // bt,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xg stays in HBM, DMA'd per step
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident in VMEM
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shapes),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xg_tm, w_g)
    h_seq = outs[0][:, :, :h].transpose(1, 0, 2)
    if with_cell:
        return h_seq, outs[1][:, :, :h].transpose(1, 0, 2)
    return h_seq


# ---------------------------------------------------------------------------
# custom_vjp: kernel forward, reverse-scan adjoint backward (training path)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_recurrence_vjp(xg, w_hh, hidden: int):
    return lstm_recurrence(xg, w_hh, hidden)


def _vjp_fwd(xg, w_hh, hidden: int):
    h_seq, c_seq = lstm_recurrence(xg, w_hh, hidden, with_cell=True)
    return h_seq, (xg, w_hh, h_seq, c_seq)


def _vjp_bwd(hidden: int, res, dh_seq):
    """Standard LSTM adjoint; gates recomputed from saved (xg, h_prev)."""
    xg, w_hh, h_seq, c_seq = res
    b, t, _ = xg.shape
    f32 = jnp.float32
    w = w_hh.astype(f32)

    def step(carry, inp):
        dh_next, dc_next = carry
        xg_t, dh_t, h_prev, c_prev, c_t = inp
        gates = xg_t + h_prev @ w
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        tanh_c = jnp.tanh(c_t)
        dh = dh_t + dh_next
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_next
        di, dg, df = dc * g, dc * i, dc * c_prev
        dz = jnp.concatenate(
            [di * i * (1 - i), df * f * (1 - f), dg * (1 - g * g), do * o * (1 - o)], axis=-1
        )
        dh_prev = dz @ w.T
        dw_t = h_prev.T @ dz
        return (dh_prev, dc * f), (dz, dw_t)

    zeros = jnp.zeros((b, hidden), f32)
    h_prev_seq = jnp.concatenate([jnp.zeros((b, 1, hidden), f32), h_seq[:, :-1].astype(f32)], axis=1)
    c_prev_seq = jnp.concatenate([jnp.zeros((b, 1, hidden), f32), c_seq[:, :-1].astype(f32)], axis=1)
    inputs = (
        xg.astype(f32).transpose(1, 0, 2),
        dh_seq.astype(f32).transpose(1, 0, 2),
        h_prev_seq.transpose(1, 0, 2),
        c_prev_seq.transpose(1, 0, 2),
        c_seq.astype(f32).transpose(1, 0, 2),
    )
    (_, _), (dxg_tm, dw_tm) = jax.lax.scan(step, (zeros, zeros), inputs, reverse=True)
    return dxg_tm.transpose(1, 0, 2).astype(xg.dtype), dw_tm.sum(axis=0).astype(w_hh.dtype)


lstm_recurrence_vjp.defvjp(_vjp_fwd, _vjp_bwd)

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
  * writes each step's ``h`` back to HBM asynchronously.

Numerics match models/bilstm.lstm_scan exactly (same gate order i,f,g,o, same
f32 accumulation); used when shapes fit the tiling constraints, with the scan
as fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pallas_lstm_available(batch: int, hidden: int, dtype) -> bool:
    """Shape gate: the gate slab's lane dim (4H) must be 128-aligned and the
    batch (sublane dim) 8-aligned for f32 tiling; Mosaic pads the H=192 lane
    dim of the state buffers itself."""
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    # VMEM budget: double-buffered gate slabs (2*4*B*Hp), out slabs, h/c state,
    # and weights must fit the ~16 MB scoped limit -> B <= 512 at Hp = 256.
    # (Batch tiling via a grid is the TODO that lifts this.)
    hp = ((hidden + 127) // 128) * 128
    vmem_bytes = (2 * 4 * batch * hp + 2 * batch * hp + 2 * batch * hp + 4 * hp * hp) * 4
    return hidden % 8 == 0 and batch % 8 == 0 and vmem_bytes <= 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("hidden",))
def lstm_recurrence(xg, w_hh, hidden: int):
    """xg: (B, T, 4H) precomputed input gates (+biases); w_hh: (H, 4H).

    Returns h-sequence (B, T, H). Gate order i, f, g, o (torch layout).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, gh = xg.shape
    h = hidden
    assert gh == 4 * h
    # Gate-major, time-major, lane-padded layout. Mosaic requires sliced/DMA'd
    # lane extents to be 128-aligned, so each gate lives as its own (B, Hp)
    # plane with Hp = H rounded up to 128. The padded lanes provably stay zero
    # through the recurrence (xg pad = 0, w pad = 0 -> c_pad = 0, h_pad = 0).
    hp = ((h + 127) // 128) * 128
    xg_g = xg.reshape(b, t, 4, h).transpose(1, 2, 0, 3)  # (T, 4, B, H)
    xg_tm = jnp.pad(xg_g, ((0, 0), (0, 0), (0, 0), (0, hp - h)))
    w_g = w_hh.reshape(h, 4, h).transpose(1, 0, 2)  # (4, H, H)
    w_g = jnp.pad(w_g, ((0, 0), (0, hp - h), (0, hp - h)))

    def kernel(xg_hbm, w_ref, out_hbm):
        def body(gates_buf, out_buf, h_ref, c_ref, in_sems, out_sems):
            n_buf = 2

            def load(slot, step):
                return pltpu.make_async_copy(xg_hbm.at[step], gates_buf.at[slot], in_sems.at[slot])

            def store(slot, step):
                return pltpu.make_async_copy(out_buf.at[slot], out_hbm.at[step], out_sems.at[slot])

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

                out_buf[slot] = new_h
                store(slot, step).start()
                return 0

            jax.lax.fori_loop(0, t, step_fn, 0)
            # drain outstanding writes
            @pl.when(t >= 2)
            def _():
                store((t - 2) % n_buf, t - 2).wait()

            store((t - 1) % n_buf, t - 1).wait()

        pl.run_scoped(
            body,
            gates_buf=pltpu.VMEM((2, 4, b, hp), jnp.float32),
            out_buf=pltpu.VMEM((2, b, hp), jnp.float32),
            h_ref=pltpu.VMEM((b, hp), jnp.float32),
            c_ref=pltpu.VMEM((b, hp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2,)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
        )

    out_tm = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, b, hp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xg stays in HBM, DMA'd per step
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident in VMEM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xg_tm, w_g)
    return out_tm[:, :, :h].transpose(1, 0, 2)

"""Probe: training flash attention — our XLA blockwise tiles vs the
Pallas flash-attention kernel bundled with jax (pallas.ops.tpu).

Question: at the deployed training shape (B=2, T=8192, H=8, D=96, bf16)
the XLA blockwise online-softmax path (ops/attention.py::
flash_causal_attention, unroll_q) measured 69 ms fwd+bwd on v5e-1 and
training MFU sits at 11.5-12.9% — attention-bound.  Does a real Pallas
MXU kernel (fused softmax, no HBM score tiles, hand-blocked) beat it?

ANSWER (measured v5e-1, r3): NO — keep the XLA path.  fwd+bwd:

    shape                 ours     pallas   pallas d128-padded
    B=2 T=8192 (deployed) 78.0 ms  92.7 ms  95.0 ms
    B=8 T=2048 (bucket)   44.3 ms  43.5 ms  43.0 ms
    B=8 T=1024 (bucket)   27.1 ms  28.0 ms  28.8 ms

The bundled kernel loses 19% at the long-sequence worst case (its dq/dkv
backward passes re-read K/V tiles without the static triangular trip
count our unroll_q path gets for free) and ties within noise at the
realistic bucket shapes, where the step is matmul- not attention-bound.
Padding D 96->128 to fill MXU lanes doesn't help — the extra HBM traffic
cancels the tiling win.  Forward-only numbers for "ours" at T=8192 are
not meaningful here (XLA fuses the fwd into the caller; timed standalone
it returns before the work is observable through the tunnel).

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/flash_probe.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.ops.attention import causal_attention, flash_causal_attention
from llmvox_tpu.utils.runtime import enable_compilation_cache


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1000.0


def main():
    enable_compilation_cache()
    shapes = [(2, 8192, 8, 96), (8, 2048, 8, 96), (8, 1024, 8, 96)]
    key = jax.random.PRNGKey(0)

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)
        have_pallas = True
    except Exception as e:  # pragma: no cover
        print("no pallas lib:", e)
        have_pallas = False

    for (b, t, h, d) in shapes:
        kq, kk, kv, kg = jax.random.split(jax.random.fold_in(key, t), 4)
        q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
        cot = jax.random.normal(kg, (b, t, h, d), jnp.bfloat16)
        print(f"== shape B={b} T={t} H={h} D={d} bf16")

        def loss_ours(q, k, v):
            return jnp.sum(flash_causal_attention(q, k, v, unroll_q=True)
                           .astype(jnp.float32) * cot.astype(jnp.float32))

        fwd_ours = jax.jit(partial(flash_causal_attention, unroll_q=True))
        fb_ours = jax.jit(jax.grad(loss_ours, argnums=(0, 1, 2)))
        print(f"  ours  fwd      {timeit(fwd_ours, q, k, v):8.2f} ms")
        print(f"  ours  fwd+bwd  {timeit(fb_ours, q, k, v):8.2f} ms")

        if have_pallas:
            sm = 1.0 / float(np.sqrt(d))
            # pallas kernel wants (B, H, T, D)
            qt = jnp.transpose(q, (0, 2, 1, 3))
            kt = jnp.transpose(k, (0, 2, 1, 3))
            vt = jnp.transpose(v, (0, 2, 1, 3))
            cott = jnp.transpose(cot, (0, 2, 1, 3))

            def run_pallas(q4, k4, v4):
                return flash_attention(q4, k4, v4, causal=True, sm_scale=sm)

            def loss_pallas(q4, k4, v4):
                return jnp.sum(run_pallas(q4, k4, v4).astype(jnp.float32)
                               * cott.astype(jnp.float32))

            try:
                fwd_p = jax.jit(run_pallas)
                fb_p = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))
                o1 = np.asarray(fwd_ours(q, k, v), np.float32)
                o2 = np.asarray(jnp.transpose(fwd_p(qt, kt, vt),
                                              (0, 2, 1, 3)), np.float32)
                err = np.abs(o1 - o2).max()
                print(f"  pallas fwd      {timeit(fwd_p, qt, kt, vt):8.2f} ms"
                      f"   (max |diff| vs ours {err:.2e})")
                print(f"  pallas fwd+bwd  {timeit(fb_p, qt, kt, vt):8.2f} ms")
            except Exception as e:
                print(f"  pallas FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}")

            # head-dim padded to 128 (MXU lane width): zero-padded D adds
            # nothing to logits and zero rows to the output slice
            try:
                pad = 128 - d
                if pad > 0:
                    qp = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    kp = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    vp = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    cotp = jnp.pad(cott, ((0, 0), (0, 0), (0, 0), (0, pad)))

                    def run_pad(q4, k4, v4):
                        return flash_attention(q4, k4, v4, causal=True,
                                               sm_scale=sm)

                    def loss_pad(q4, k4, v4):
                        return jnp.sum(run_pad(q4, k4, v4)
                                       .astype(jnp.float32)
                                       * cotp.astype(jnp.float32))

                    fwd_pp = jax.jit(run_pad)
                    fb_pp = jax.jit(jax.grad(loss_pad, argnums=(0, 1, 2)))
                    print(f"  pallas d128 fwd      "
                          f"{timeit(fwd_pp, qp, kp, vp):8.2f} ms")
                    print(f"  pallas d128 fwd+bwd  "
                          f"{timeit(fb_pp, qp, kp, vp):8.2f} ms")
            except Exception as e:
                print(f"  pallas d128 FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()

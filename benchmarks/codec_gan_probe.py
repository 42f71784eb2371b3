"""Which codec-GAN micro program exhausts HBM at the deployed shape?

Runs each micro-step phase synchronously (block_until_ready) at batch
``argv[1]`` and prints per-phase wall time + device memory stats, so an
OOM names its program instead of surfacing at the final log fetch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/codec_gan_probe.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llmvox_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llmvox_tpu.train.codec_trainer import CodecTrainer, _tree_at  # noqa: E402
from llmvox_tpu.utils.config import CodecConfig, CodecTrainConfig  # noqa: E402


def _mem(tag: str) -> None:
    try:
        st = jax.devices()[0].memory_stats()
        used = st.get("bytes_in_use", 0) / 1e9
        peak = st.get("peak_bytes_in_use", 0) / 1e9
        print(f"  [{tag}] in_use {used:.2f} GB, peak {peak:.2f} GB",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  [{tag}] memory_stats unavailable: {e!r}", flush=True)


def _sync(tag: str, out, probe=None):
    # block_until_ready returns early on the tunnel platform (errors
    # surface at value fetch) — force a real roundtrip by FETCHING one
    # output (a program's output being ready implies the whole program
    # executed).  ``probe`` picks a small output; default: first leaf.
    t0 = time.perf_counter()
    ref = probe(out) if probe is not None else jax.tree.leaves(out)[0]
    val = np.asarray(ref)
    print(f"{tag}: {1e3 * (time.perf_counter() - t0):.1f} ms "
          f"(fetched {val.shape} {val.dtype})", flush=True)
    _mem(tag)
    return out


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cfg = CodecConfig()
    tcfg = CodecTrainConfig(batch_size=batch, step_impl="micro")
    t0 = time.time()
    trainer = CodecTrainer(cfg, tcfg)
    print(f"init {time.time() - t0:.1f}s", flush=True)
    _mem("init")

    rng = np.random.default_rng(0)
    audio_np = 0.1 * rng.standard_normal(
        (batch, tcfg.num_samples)).astype(np.float32)
    key, trainer.rng = jax.random.split(trainer.rng)
    audio = jax.device_put(jnp.asarray(audio_np, jnp.float32), trainer.bsh)

    st = trainer.state
    k_vq, bw, train_disc = _sync(
        "keys", trainer._m_keys(st.step, key))
    y_c, yh_c = _sync(
        "gen_infer", trainer._m_gen_infer(st.gen_params, st.vq_state,
                                          audio, bw),
        probe=lambda o: o[1])
    outs = []
    for u, p in zip(trainer._m_disc_unit, trainer._m_paths):
        outs.append(_sync(f"disc_unit {p}",
                          u(_tree_at(st.disc_params, p), y_c, yh_c),
                          probe=lambda o: o[0][0]))
    st, d_logs = _sync("disc_apply", trainer._m_disc_apply(
        st, [g for _, g in outs], [o[0][1] for o in outs], train_disc),
        probe=lambda o: o[1]["disc_total"])
    del outs
    y_c, yh_c, commit, new_vq = _sync(
        "gen_fwd", trainer._m_gen_fwd(st.gen_params, st.vq_state, audio,
                                      bw, k_vq),
        probe=lambda o: o[2])
    cots, ws, glogs = [], [], []
    for u, p in zip(trainer._m_gen_unit, trainer._m_paths):
        c, w, lg = _sync(f"gen_unit {p}",
                         u(_tree_at(st.disc_params, p), y_c, yh_c),
                         probe=lambda o: o[1])
        cots.append(c)
        ws.append(w)
        glogs.append(lg)
    mcot, mel = _sync("mel_cot", trainer._m_mel_cot(y_c, yh_c),
                      probe=lambda o: o[1])
    cot = _sync("combine", trainer._m_combine(cots, mcot, train_disc))
    grads = _sync("gen_vjp", trainer._m_gen_vjp(
        st.gen_params, st.vq_state, audio, bw, k_vq, cot))
    st, g_logs = _sync("gen_apply", trainer._m_gen_apply(
        st, grads, new_vq, ws, glogs, mel, commit, train_disc),
        probe=lambda o: o[1]["gen_total"])
    trainer.state = st
    print({k: round(float(v), 4) for k, v in {**d_logs, **g_logs}.items()},
          flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()

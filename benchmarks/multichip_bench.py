"""Multi-chip scaling bench: dp/tp wall-clock over a real or virtual mesh.

No >1-chip hardware is reachable from this box, so every sharding so far
is proven correct (tests + driver dryrun) but unmeasured.  This harness
is the measurement: it times, at each requested dp size,

1. the decoder train step (pjit dp over the mesh, deployed 30M shapes
   scaled by ``--scale``) -> tokens/s;
2. the sharded pooled serve block (``serve.batch.make_sharded_decode``,
   streams sharded over dp) -> tokens/s across all streams;
3. the llama TP decode block at tp = the mesh's tp size;
4. the llama PP pooled decode block (``models/llama_pp.py``) at
   ``--pp_size`` stages.

Run it day-one on a real slice:

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/multichip_bench.py --dp_sizes 1,2,4,8

On this box it self-bootstraps a virtual CPU mesh (like
``__graft_entry__.dryrun_multichip``) so the *harness* stays proven; the
numbers it prints there measure host-CPU emulation, not silicon — the
JSON marks them ``"virtual": true``.
"""
from __future__ import annotations

import argparse
import json
import statistics
import time


def _bootstrap_virtual(n: int, argv) -> None:
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from benchmarks import multichip_bench as m; "
            f"m.run({argv!r}, virtual=True)")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=repo)


def _timed(fn, reps: int) -> float:
    fn()
    fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def run(argv=None, virtual: bool = False) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dp_sizes", default="1,2,4,8",
                        help="comma-separated dp sizes to sweep")
    parser.add_argument("--tp_size", type=int, default=2,
                        help="tp width for the llama row")
    parser.add_argument("--pp_size", type=int, default=2,
                        help="pipeline stages for the llama pp row; "
                             "<=1 skips it")
    parser.add_argument("--ep_size", type=int, default=2,
                        help="expert-parallel size for the MoE llama row "
                             "(0/1 skips)")
    parser.add_argument("--sp_sizes", default="2,4",
                        help="comma-separated sp (ring attention) sizes "
                             "for the sequence-parallel train row; '' "
                             "skips it")
    parser.add_argument("--scale", type=float, default=1.0,
                        help="model-size scale (1.0 = deployed shapes; "
                             "use 0.1 on the virtual CPU mesh)")
    parser.add_argument("--seq_len", type=int, default=1024)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--out_json", default="")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    dp_sizes = [int(s) for s in args.dp_sizes.split(",") if s]
    sp_sizes = [int(s) for s in args.sp_sizes.split(",") if s]
    need = max(max(dp_sizes), args.tp_size, max(sp_sizes, default=1))
    if len(jax.devices()) < need:
        _bootstrap_virtual(need, list(argv) if argv is not None else
                           __import__("sys").argv[1:])
        return

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.models import llama
    from llmvox_tpu.parallel.mesh import create_mesh
    from llmvox_tpu.parallel.sharding import (batch_sharding,
                                              decoder_param_shardings,
                                              llama_param_shardings,
                                              replicated)
    from llmvox_tpu.serve.batch import make_sharded_decode
    from llmvox_tpu.train.optim import make_optimizer
    from llmvox_tpu.train.trainer import TrainState, make_train_step
    from llmvox_tpu.utils.config import DecoderConfig, TrainConfig

    s = args.scale
    if s >= 1.0:
        cfg = DecoderConfig()
    else:
        # text_embed_dim + speech_embed_dim must equal n_embd (the
        # decoder concatenates them); keep the dryrun's tiny proportions
        ne = max(64, int(768 * s) // 64 * 64)
        te = ne * 3 // 8
        cfg = DecoderConfig(n_embd=ne, n_head=4,
                            n_layer=max(1, round(4 * s)),
                            block_size=512, vocab_size=256,
                            text_embed_dim=te, speech_embed_dim=ne - te,
                            text_vocab_size=386)
    rows = []

    for dp in dp_sizes:
        mesh = create_mesh(dp_size=dp, tp_size=1)
        rng = np.random.default_rng(0)

        # ---- decoder training, dp-sharded -----------------------------
        tcfg = TrainConfig(batch_size=dp, gradient_accumulation_steps=1,
                           warmup_iters=1, lr_decay_iters=10)
        params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
        params = jax.device_put(params, decoder_param_shardings(mesh, params))
        tx = make_optimizer(tcfg, params)
        opt_state = jax.jit(tx.init)(params)
        state = TrainState(params, opt_state, jnp.int32(0))
        rep, bsh = replicated(mesh), batch_sharding(mesh)
        table = jax.device_put(
            jnp.zeros((cfg.text_vocab_size, cfg.text_embed_dim)), rep)
        codebook = jax.device_put(
            jnp.zeros((max(cfg.vocab_size, cfg.eoa_token_id + 1),
                       cfg.speech_embed_dim)), rep)
        t = args.seq_len
        text_ids = jax.device_put(
            jnp.asarray(rng.integers(0, 256, (dp, t)), jnp.int32), bsh)
        targets = jax.device_put(
            jnp.asarray(rng.integers(0, cfg.vocab_size, (dp, t)),
                        jnp.int32), bsh)
        step = jax.jit(make_train_step(cfg, tx, jnp.float32),
                       donate_argnums=(0,))
        holder = {"state": state}

        def train_once():
            holder["state"], loss = step(holder["state"], table, codebook,
                                         text_ids, targets,
                                         jax.random.PRNGKey(1))
            jax.block_until_ready(loss)

        train_s = _timed(train_once, args.reps)
        rows.append({"what": "decoder_train_step", "dp": dp,
                     "batch": dp, "seq": t,
                     "step_ms": round(train_s * 1e3, 2),
                     "tokens_per_s": round(dp * t / train_s, 1)})

        # ---- sharded pooled serve block -------------------------------
        bsrv = 2 * dp
        blk = 32
        sstates = dec.init_decode_state_batch(cfg, bsrv, jnp.float32)
        sharded = make_sharded_decode(cfg, blk, mesh)
        windows = jnp.zeros((bsrv, blk), jnp.int32)
        ones = jnp.ones((bsrv,), jnp.int32)
        sholder = {"states": sstates}

        def serve_once():
            tokens, _, sholder["states"] = sharded(
                holder["state"].params, table, codebook, sholder["states"],
                windows, ones, blk * ones)
            jax.block_until_ready(tokens)

        serve_s = _timed(serve_once, args.reps)
        rows.append({"what": "sharded_serve_block", "dp": dp,
                     "streams": bsrv, "block": blk,
                     "block_ms": round(serve_s * 1e3, 2),
                     "tokens_per_s": round(bsrv * blk / serve_s, 1)})

        # ---- dp-sharded Whisper ASR (batched utterances over dp) ------
        # one utterance per device through the encode -> cross-KV ->
        # prefill -> decode-block chain (models/whisper.py); inputs and
        # per-utterance state shard on the batch axis, weights replicate
        from jax.sharding import NamedSharding, PartitionSpec as P

        from llmvox_tpu.models import whisper as W
        from llmvox_tpu.parallel.mesh import DP_AXIS
        if s >= 1.0:
            wcfg = W.WhisperConfig(vocab_size=51865, d_model=512,
                                   enc_layers=6, dec_layers=6, enc_heads=8,
                                   dec_heads=8, enc_ffn=2048, dec_ffn=2048)
        else:
            wd = max(64, int(512 * s) // 64 * 64)
            wcfg = W.WhisperConfig(
                vocab_size=256, n_mels=16, d_model=wd,
                enc_layers=max(1, int(6 * s)), dec_layers=max(1, int(6 * s)),
                enc_heads=4, dec_heads=4, enc_ffn=4 * wd, dec_ffn=4 * wd,
                max_source_positions=max(64, int(1500 * s)),
                max_target_positions=64)
        wrep = NamedSharding(mesh, P())
        wb = NamedSharding(mesh, P(DP_AXIS))
        wb1 = NamedSharding(mesh, P(None, DP_AXIS))
        wparams = jax.device_put(
            W.init_whisper_params(jax.random.PRNGKey(5), wcfg), wrep)
        mel = jax.device_put(
            jnp.zeros((dp, wcfg.n_audio_frames, wcfg.n_mels)),
            NamedSharding(mesh, P(DP_AXIS, None, None)))
        st0 = W.init_whisper_decode_state(wcfg, dp)
        st0 = W.WhisperDecodeState(
            jax.device_put(st0.k, wb1), jax.device_put(st0.v, wb1),
            st0.pos, jax.device_put(st0.done, wb))
        forced = jax.device_put(jnp.zeros((dp, 4), jnp.int32), wb)

        def asr_once():
            enc = W.encode(wparams, mel, wcfg)
            cross = W.make_cross_kv(wparams, enc, wcfg)
            lg, st = W.prefill(wparams, forced, st0, cross, wcfg)
            tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
            toks, _ = W.decode_block(wparams, tok, st, cross, wcfg,
                                     block=16)
            jax.block_until_ready(toks)

        asr_s = _timed(asr_once, args.reps)
        rows.append({"what": "whisper_asr_dp_batch", "dp": dp,
                     "utterances": dp,
                     "chain_ms": round(asr_s * 1e3, 2),
                     "utterances_per_s": round(dp / asr_s, 2)})
        print(json.dumps(rows[-3]), flush=True)
        print(json.dumps(rows[-2]), flush=True)
        print(json.dumps(rows[-1]), flush=True)

    # ---- sequence-parallel (ring attention) train step -----------------
    # the long-context scaling row: same global (batch=1, T) work, the T
    # axis sharded over the sp ring (ops/ring_attention.py) — on a real
    # slice the step time should drop toward 1/sp of the dp=1 row's at
    # attention-bound shapes
    from llmvox_tpu.ops.ring_attention import make_ring_attention
    from llmvox_tpu.parallel.sharding import batch_seq_sharding
    for sp in sp_sizes:
        if sp > len(jax.devices()) or args.seq_len % sp:
            continue
        mesh = create_mesh(dp_size=1, sp_size=sp)
        rng = np.random.default_rng(0)
        tcfg = TrainConfig(batch_size=1, gradient_accumulation_steps=1,
                           warmup_iters=1, lr_decay_iters=10)
        params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
        params = jax.device_put(params, replicated(mesh))
        tx = make_optimizer(tcfg, params)
        state = TrainState(params, jax.jit(tx.init)(params), jnp.int32(0))
        rep, bsh = replicated(mesh), batch_seq_sharding(mesh)
        table = jax.device_put(
            jnp.zeros((cfg.text_vocab_size, cfg.text_embed_dim)), rep)
        codebook = jax.device_put(
            jnp.zeros((max(cfg.vocab_size, cfg.eoa_token_id + 1),
                       cfg.speech_embed_dim)), rep)
        t = args.seq_len
        text_ids = jax.device_put(
            jnp.asarray(rng.integers(0, 256, (1, t)), jnp.int32), bsh)
        targets = jax.device_put(
            jnp.asarray(rng.integers(0, cfg.vocab_size, (1, t)),
                        jnp.int32), bsh)
        step = jax.jit(make_train_step(cfg, tx, jnp.float32,
                                       attn_fn=make_ring_attention(mesh)),
                       donate_argnums=(0,))
        sp_holder = {"state": state}

        def sp_once():
            sp_holder["state"], loss = step(sp_holder["state"], table,
                                            codebook, text_ids, targets,
                                            jax.random.PRNGKey(1))
            jax.block_until_ready(loss)

        sp_s = _timed(sp_once, args.reps)
        rows.append({"what": "decoder_train_step_sp", "sp": sp,
                     "batch": 1, "seq": t,
                     "step_ms": round(sp_s * 1e3, 2),
                     "tokens_per_s": round(t / sp_s, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # ---- llama TP decode ---------------------------------------------
    if args.tp_size > 1:
        mesh = create_mesh(dp_size=1, tp_size=args.tp_size)
        lcfg = llama.LlamaConfig(
            vocab_size=384, n_layer=max(2, int(12 * s)),
            n_head=8, n_kv_head=4,
            n_embd=max(128, int(768 * s) // 128 * 128),
            intermediate_size=max(256, int(2048 * s) // 128 * 128),
            max_seq_len=1024)
        lparams = llama.init_llama_params(jax.random.PRNGKey(2), lcfg)
        lparams = jax.device_put(lparams,
                                 llama_param_shardings(mesh, lparams))
        lstate = llama.init_llama_decode_state(lcfg, batch=1)
        lg, lstate = llama.prefill(
            lparams, jnp.zeros((1, 16), jnp.int32), lstate, lcfg)
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        lh = {"st": lstate}

        def llama_once():
            toks, lh["st"] = llama.decode_block(
                lparams, tok, lh["st"], jax.random.PRNGKey(3), lcfg,
                block=16)
            jax.block_until_ready(toks)

        llama_s = _timed(llama_once, args.reps)
        rows.append({"what": "llama_tp_decode_block",
                     "tp": args.tp_size, "block": 16,
                     "block_ms": round(llama_s * 1e3, 2),
                     "tokens_per_s": round(16 / llama_s, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # ---- llama PP pooled decode (models/llama_pp.py) -------------------
    if args.pp_size > 1:
        import numpy as _np

        from llmvox_tpu.models import llama_pp
        pp_mesh = jax.sharding.Mesh(
            _np.asarray(jax.devices()[:args.pp_size]).reshape(
                args.pp_size), (llama_pp.PP_AXIS,))
        pcfg = llama.LlamaConfig(
            vocab_size=384,
            n_layer=max(args.pp_size, int(12 * s) // args.pp_size
                        * args.pp_size),
            n_head=8, n_kv_head=4,
            n_embd=max(128, int(768 * s) // 128 * 128),
            intermediate_size=max(256, int(2048 * s) // 128 * 128),
            max_seq_len=1024)
        b = 2 * args.pp_size
        pparams = llama.init_llama_params(jax.random.PRNGKey(4), pcfg)
        pparams = jax.device_put(
            pparams, llama_pp.llama_pp_param_shardings(pp_mesh, pparams))
        ppstate = jax.device_put(
            llama.init_llama_pool_state(pcfg, batch=b),
            llama_pp.llama_pp_state_shardings(pp_mesh))
        pp_prefill = llama_pp.make_pp_prefill(pp_mesh, pcfg,
                                              n_micro=args.pp_size)
        pp_decode = llama_pp.make_pp_decode(pp_mesh, pcfg, block=16,
                                            n_micro=args.pp_size)
        toks0 = jnp.zeros((b, 16), jnp.int32)
        valid0 = jnp.full((b,), 16, jnp.int32)
        _, ppstate = pp_prefill(pparams, toks0, valid0, ppstate,
                                jax.random.PRNGKey(5))
        active = jnp.ones((b,), bool)
        ph = {"st": ppstate}

        def pp_once():
            toks, ph["st"] = pp_decode(pparams, ph["st"], active,
                                       jax.random.PRNGKey(6))
            jax.block_until_ready(toks)

        pp_s = _timed(pp_once, args.reps)
        rows.append({"what": "llama_pp_pooled_decode_block",
                     "pp": args.pp_size, "batch": b, "block": 16,
                     "block_ms": round(pp_s * 1e3, 2),
                     "tokens_per_s": round(16 * b / pp_s, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # ---- MoE llama expert-parallel pooled decode (ops/moe.py) ----------
    if args.ep_size > 1:
        mesh_ep = create_mesh(dp_size=1, ep_size=args.ep_size)
        ecfg = llama.LlamaConfig(
            vocab_size=384, n_layer=max(2, int(12 * s)),
            n_head=8, n_kv_head=4,
            n_embd=max(128, int(768 * s) // 128 * 128),
            intermediate_size=max(256, int(1024 * s) // 128 * 128),
            max_seq_len=1024, n_experts=2 * args.ep_size, moe_top_k=2)
        b = 8
        eparams = llama.init_llama_params(jax.random.PRNGKey(7), ecfg)
        eparams = jax.device_put(eparams,
                                 llama_param_shardings(mesh_ep, eparams))
        estate = llama.init_llama_pool_state(ecfg, batch=b)
        _, estate = llama.prefill_slots(
            eparams, jnp.zeros((b, 16), jnp.int32),
            jnp.full((b,), 16, jnp.int32), estate,
            jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
            jax.random.PRNGKey(8), ecfg)
        eactive = jnp.ones((b,), bool)
        eh = {"st": estate}

        def moe_once():
            toks, eh["st"] = llama.decode_block_pooled(
                eparams, eh["st"], eactive, jax.random.PRNGKey(9), ecfg,
                block=16)
            jax.block_until_ready(toks)

        moe_s = _timed(moe_once, args.reps)
        rows.append({"what": "llama_moe_ep_pooled_decode_block",
                     "ep": args.ep_size, "experts": ecfg.n_experts,
                     "batch": b, "block": 16,
                     "block_ms": round(moe_s * 1e3, 2),
                     "tokens_per_s": round(16 * b / moe_s, 1)})
        print(json.dumps(rows[-1]), flush=True)

        # GSPMD einsum partitioning vs the hand-written all_to_all
        # dispatch (ops/moe.py::moe_ffn_a2a) at a prefill-ish token
        # count — the day-one real-slice decision row for which MoE
        # dispatch path serves production shapes (STATUS r3 candidate;
        # parity is proven in tests/test_moe.py, this row is the speed).
        from llmvox_tpu.ops.moe import make_moe_a2a, moe_ffn
        from jax.sharding import NamedSharding, PartitionSpec as P

        e, c, inter = ecfg.n_experts, ecfg.n_embd, ecfg.intermediate_size
        ntok = 2048
        kx = jax.random.PRNGKey(11)
        xg = jax.device_put(
            jax.random.normal(kx, (ntok, c), jnp.bfloat16),
            NamedSharding(mesh_ep, P("ep", None)))
        rw = jax.device_put(0.02 * jax.random.normal(
            jax.random.PRNGKey(12), (c, e), jnp.bfloat16),
            NamedSharding(mesh_ep, P()))
        exp_sh = NamedSharding(mesh_ep, P("ep", None, None))
        wg = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(13), (e, c, inter), jnp.bfloat16)
            / np.sqrt(c), exp_sh)
        wu = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(14), (e, c, inter), jnp.bfloat16)
            / np.sqrt(c), exp_sh)
        wd = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(15), (e, inter, c), jnp.bfloat16)
            / np.sqrt(inter), exp_sh)

        # Time the two paths IDENTICALLY (ADVICE r4): both jits take the
        # weights as runtime args (no closed-over constants) and return
        # only y, so the aux loss and its reductions are dead-code in
        # BOTH programs, not just one.
        n_loc = ntok // args.ep_size
        gspmd = jax.jit(lambda x, r, g, u, d: moe_ffn(
            x, r, g, u, d, top_k=2, group_size=n_loc,
            drop_free=True)[0])
        _a2a_full = make_moe_a2a(mesh_ep, top_k=2, drop_free=True)
        a2a = jax.jit(lambda x, r, g, u, d: _a2a_full(x, r, g, u, d)[0])
        jax.block_until_ready(gspmd(xg, rw, wg, wu, wd))
        ta = _timed(lambda: jax.block_until_ready(
            gspmd(xg, rw, wg, wu, wd)), args.reps)
        jax.block_until_ready(a2a(xg, rw, wg, wu, wd))
        tb = _timed(lambda: jax.block_until_ready(
            a2a(xg, rw, wg, wu, wd)), args.reps)
        rows.append({"what": "moe_ffn_dispatch_gspmd_vs_a2a",
                     "ep": args.ep_size, "experts": e, "tokens": ntok,
                     "gspmd_ms": round(ta * 1e3, 2),
                     "a2a_ms": round(tb * 1e3, 2),
                     "a2a_speedup": round(ta / max(tb, 1e-9), 2)})
        print(json.dumps(rows[-1]), flush=True)

    report = {"virtual": virtual, "n_devices": len(jax.devices()),
              "scale": s, "rows": rows}
    print(json.dumps(report))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=1)


def main() -> None:
    run()


if __name__ == "__main__":
    main()

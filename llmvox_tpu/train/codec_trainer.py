"""WavTokenizer codec GAN training on TPU.

Rebuild of the Lightning experiment (decoder/experiment.py:86-218) as one
jitted alternating step over a data-parallel mesh:

- **generator** = SEANet encoder (weight-norm reparam) -> EMA VQ (STE +
  commitment, functional state) -> ConvNeXt backbone -> ISTFT head;
- **discriminator pass** (optimizer 0): hinge loss on vocos MPD + MRD
  (mrd_loss_coeff-weighted) + least-squares DAC loss, generator output
  detached;
- **generator pass** (optimizer 1): hinge adversarial + feature-matching
  on MPD/MRD, DAC adversarial + feature L1, mel L1 x mel_loss_coeff,
  commitment x 1000 (experiment.py:151-188);
- both AdamW optimizers follow transformers' warmup-cosine schedule over
  max_steps/2 (experiment.py:98-107);
- per-step random bandwidth_id in [0, 4) (experiment.py:447-452);
- gradients are DP-averaged by GSPMD; VQ EMA stats are psum'd inside the
  step (replacing encoder/distrib.py's NCCL broadcast/all-reduce).
"""
from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llmvox_tpu.codec import backbone as bb
from llmvox_tpu.codec import discriminators as disc
from llmvox_tpu.codec import heads, losses, seanet
from llmvox_tpu.parallel import mesh as pmesh
from llmvox_tpu.parallel.sharding import batch_sharding, replicated
from llmvox_tpu.train import checkpoint as ckpt
from llmvox_tpu.train.vq_train import VQState, init_vq_state, vq_train_step
from llmvox_tpu.utils.config import CodecConfig, CodecTrainConfig


class CodecTrainState(NamedTuple):
    gen_params: Dict
    disc_params: Dict
    vq_state: VQState
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: jnp.ndarray


def init_generator_params(key: jax.Array, cfg: CodecConfig) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": seanet.init_seanet_encoder(k1, cfg, weight_norm=True),
        "backbone": bb.init_backbone(k2, cfg),
        "head": heads.init_istft_head(k3, cfg),
    }


def init_discriminator_params(key: jax.Array,
                              tcfg: CodecTrainConfig) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"mpd": disc.init_mpd(k1, tcfg.mpd_periods),
            "mrd": disc.init_mrd(k2, tcfg.mrd_resolutions),
            "dac": disc.init_dac(k3, tcfg.dac_periods, tcfg.dac_fft_sizes)}


def generator_forward(gen_params: Dict, vq_state: VQState, audio: jnp.ndarray,
                      bandwidth_id, key: jax.Array, cfg: CodecConfig,
                      tcfg: CodecTrainConfig, *, train: bool = True,
                      axis_name: Optional[str] = None,
                      remat: bool = False):
    """audio (B, T) -> (audio_hat (B, T'), commit_loss, new_vq_state).

    ``remat=True`` rematerializes the SEANet encoder and the backbone
    +head (jax.checkpoint): at the deployed batch-40 x 3 s shape the
    saved conv activations of a plain VJP exhaust the single chip's HBM
    (round-5 finding — benchmarks/codec_gan_probe.py names gen_vjp);
    remat trades one recompute of each stage for a peak of max-of-stages
    instead of sum.  Bitwise-identical gradients."""
    enc_fn = seanet.apply_seanet_encoder
    if remat:
        enc_fn = jax.checkpoint(
            lambda p, a: seanet.apply_seanet_encoder(p, a, cfg),
            static_argnums=())
        emb = enc_fn(gen_params["encoder"], audio)
    else:
        emb = enc_fn(gen_params["encoder"], audio, cfg)
    b, l, d = emb.shape
    flat = emb.reshape(b * l, d)
    if train:
        quant, _, commit, vq_state = vq_train_step(
            vq_state, flat, key, decay=tcfg.vq_decay,
            threshold_dead=tcfg.vq_threshold_dead,
            kmeans_iters=tcfg.vq_kmeans_iters, axis_name=axis_name)
    else:
        from llmvox_tpu.train.vq_train import vq_infer
        quant, _ = vq_infer(vq_state, flat)
        commit = jnp.float32(0.0)
    features = quant.reshape(b, l, d)

    def synth(bb_head, feats):
        h = bb.apply_backbone(bb_head[0], feats, bandwidth_id, cfg)
        return heads.apply_istft_head(bb_head[1], h, cfg)

    if remat:
        synth = jax.checkpoint(synth)
    audio_hat = synth((gen_params["backbone"], gen_params["head"]), features)
    return audio_hat, commit, vq_state


def _vocos_disc_scores(disc_params, y, y_hat, tcfg: CodecTrainConfig):
    mp_r = [disc.apply_discriminator_p(p, y, per)
            for p, per in zip(disc_params["mpd"], tcfg.mpd_periods)]
    mp_g = [disc.apply_discriminator_p(p, y_hat, per)
            for p, per in zip(disc_params["mpd"], tcfg.mpd_periods)]
    mrd_r = [disc.apply_discriminator_r(p, y, res)
             for p, res in zip(disc_params["mrd"], tcfg.mrd_resolutions)]
    mrd_g = [disc.apply_discriminator_r(p, y_hat, res)
             for p, res in zip(disc_params["mrd"], tcfg.mrd_resolutions)]
    return mp_r, mp_g, mrd_r, mrd_g


def warmup_cosine_lr(tcfg: CodecTrainConfig):
    """transformers.get_cosine_schedule_with_warmup over max_steps // 2."""
    total = max(tcfg.max_steps // 2, 1)
    warm = tcfg.num_warmup_steps

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        lr = tcfg.initial_learning_rate
        warm_lr = lr * step / max(warm, 1)
        progress = jnp.clip((step - warm) / max(total - warm, 1), 0.0, 1.0)
        cos_lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warm, warm_lr, cos_lr)

    return fn


def make_codec_gan_steps(cfg: CodecConfig, tcfg: CodecTrainConfig,
                         tx_g, tx_d, axis_name: Optional[str] = None):
    """The alternating GAN step split at the reference's optimizer
    boundary (experiment.py:86-218 runs two `optimizer_step`s per batch):
    returns ``(disc_step, gen_step)``, each a separately-jittable
    half-size program.  Chained with the same key the pair traces the
    exact computation of the fused `make_codec_gan_step` (equality up to
    XLA fusion ordering: test_split_step_matches_fused)."""
    nperiods = len(tcfg.mpd_periods)
    nres = len(tcfg.mrd_resolutions)

    def disc_loss_fn(disc_params, y, y_hat):
        mp_r, mp_g, mrd_r, mrd_g = _vocos_disc_scores(disc_params, y, y_hat,
                                                      tcfg)
        loss_mp = losses.discriminator_loss(
            [s for s, _ in mp_r], [s for s, _ in mp_g]) / nperiods
        loss_mrd = losses.discriminator_loss(
            [s for s, _ in mrd_r], [s for s, _ in mrd_g]) / nres
        d_fake = disc.apply_dac(disc_params["dac"], y_hat,
                                tcfg.dac_periods, tcfg.dac_fft_sizes)
        d_real = disc.apply_dac(disc_params["dac"], y,
                                tcfg.dac_periods, tcfg.dac_fft_sizes)
        loss_dac = losses.dac_discriminator_loss(d_fake, d_real)
        total = loss_mp + tcfg.mrd_loss_coeff * loss_mrd + loss_dac
        return total, {"disc_mp": loss_mp, "disc_mrd": loss_mrd,
                       "disc_dac": loss_dac}

    def gen_loss_fn(gen_params, disc_params, vq_state, y, bandwidth_id, key,
                    train_disc):
        y_hat, commit, new_vq = generator_forward(
            gen_params, vq_state, y, bandwidth_id, key, cfg, tcfg,
            train=True, axis_name=axis_name)
        tlen = min(y.shape[-1], y_hat.shape[-1])
        y_c, yh_c = y[:, :tlen], y_hat[:, :tlen]

        mel = losses.mel_loss(yh_c, y_c, sample_rate=tcfg.sample_rate)

        mp_r, mp_g, mrd_r, mrd_g = _vocos_disc_scores(disc_params, y_c, yh_c,
                                                      tcfg)
        loss_gen_mp = losses.generator_loss([s for s, _ in mp_g]) / nperiods
        loss_gen_mrd = losses.generator_loss([s for s, _ in mrd_g]) / nres
        fm_mp = losses.feature_matching_loss(
            [f for _, f in mp_r], [f for _, f in mp_g]) / nperiods
        fm_mrd = losses.feature_matching_loss(
            [f for _, f in mrd_r], [f for _, f in mrd_g]) / nres
        d_fake = disc.apply_dac(disc_params["dac"], yh_c,
                                tcfg.dac_periods, tcfg.dac_fft_sizes)
        d_real = disc.apply_dac(disc_params["dac"], y_c,
                                tcfg.dac_periods, tcfg.dac_fft_sizes)
        dac_g, dac_feat = losses.dac_generator_loss(d_fake, d_real)

        adv = (loss_gen_mp + tcfg.mrd_loss_coeff * loss_gen_mrd + fm_mp +
               tcfg.mrd_loss_coeff * fm_mrd + dac_g + dac_feat)
        total = (train_disc * adv + tcfg.mel_loss_coeff * mel +
                 tcfg.commit_loss_coeff * commit)
        aux = {"gen_total": total, "mel": mel, "commit": commit,
               "gen_mp": loss_gen_mp, "gen_mrd": loss_gen_mrd,
               "fm_mp": fm_mp, "fm_mrd": fm_mrd, "dac_g": dac_g,
               "dac_feat": dac_feat, "vq_state": new_vq, "y_hat": yh_c}
        return total, aux

    def _keys_and_gates(state: CodecTrainState, key: jax.Array):
        # Both halves derive the SAME bandwidth / VQ keys and pretrain
        # gate from (state.step, key), so the split pair traces the same
        # computation as the fused step.
        k_bw, k_vq, _ = jax.random.split(key, 3)
        bandwidth_id = jax.random.randint(k_bw, (), 0,
                                          cfg.adanorm_num_embeddings)
        train_disc = (state.step >= tcfg.pretrain_mel_steps).astype(jnp.float32)
        return k_vq, bandwidth_id, train_disc

    def disc_step(state: CodecTrainState, audio: jnp.ndarray, key: jax.Array):
        # ---- optimizer 0: discriminators (generator frozen, no VQ update)
        k_vq, bandwidth_id, train_disc = _keys_and_gates(state, key)
        y_hat_detached, _, _ = generator_forward(
            state.gen_params, state.vq_state, audio, bandwidth_id, k_vq,
            cfg, tcfg, train=False, axis_name=axis_name)
        tlen = min(audio.shape[-1], y_hat_detached.shape[-1])
        (d_total, d_logs), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(
                state.disc_params, audio[:, :tlen],
                jax.lax.stop_gradient(y_hat_detached[:, :tlen]))
        d_grads = jax.tree.map(lambda g: g * train_disc, d_grads)
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d,
                                       state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        logs = {**d_logs, "disc_total": d_total}
        return state._replace(disc_params=disc_params, opt_d=opt_d), logs

    def gen_step(state: CodecTrainState, audio: jnp.ndarray, key: jax.Array):
        # ---- optimizer 1: generator (disc frozen) -----------------------
        # state.step is untouched by disc_step, so the gates recompute
        # identically here.
        k_vq, bandwidth_id, train_disc = _keys_and_gates(state, key)
        (g_total, aux), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(
                state.gen_params, state.disc_params, state.vq_state, audio,
                bandwidth_id, k_vq, train_disc)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g,
                                      state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        logs = {
            # generator grad norm (GradNormCallback parity,
            # WavTokenizer/decoder/helpers.py)
            "grad_norm_gen": optax.global_norm(g_grads),
            **{k: v for k, v in aux.items()
               if k not in ("vq_state", "y_hat")}}
        new_state = state._replace(
            gen_params=gen_params, vq_state=aux["vq_state"], opt_g=opt_g,
            step=state.step + 1)
        return new_state, logs

    return disc_step, gen_step


def _micro_units(tcfg: CodecTrainConfig):
    """Per-sub-discriminator loss units for the micro step.

    Every GAN loss term is a SUM over independent sub-discriminators with
    disjoint parameters (losses.py:17-78), so both optimizer halves
    factor exactly into one small program per sub-discriminator.  Returns
    ``[(path, disc_fn, gen_fn)]`` where ``path`` indexes ``disc_params``
    and each fn is ``(p_unit, y, y_hat) -> (weighted_loss, logs)``:
    ``disc_fn``'s value is the unit's contribution to the total
    discriminator loss (grads of the sum == sum of unit grads), and
    ``gen_fn``'s is its contribution to the generator's adversarial
    term (differentiated w.r.t. ``y_hat`` — the cotangents add by the
    chain rule)."""
    nperiods = len(tcfg.mpd_periods)
    nres = len(tcfg.mrd_resolutions)
    units = []

    for i, per in enumerate(tcfg.mpd_periods):
        def d_mpd(p, y, yh, per=per):
            sr, _ = disc.apply_discriminator_p(p, y, per)
            sg, _ = disc.apply_discriminator_p(p, yh, per)
            l = (jnp.mean(jnp.maximum(1.0 - sr, 0.0)) +
                 jnp.mean(jnp.maximum(1.0 + sg, 0.0))) / nperiods
            return l, {"disc_mp": l}

        def g_mpd(p, y, yh, per=per):
            _, fr = disc.apply_discriminator_p(p, y, per)
            sg, fg = disc.apply_discriminator_p(p, yh, per)
            h = jnp.mean(jnp.maximum(1.0 - sg, 0.0)) / nperiods
            fm = sum(jnp.mean(jnp.abs(a - b))
                     for a, b in zip(fr, fg)) / nperiods
            return h + fm, {"gen_mp": h, "fm_mp": fm}

        units.append((("mpd", i), d_mpd, g_mpd))

    for i, res in enumerate(tcfg.mrd_resolutions):
        def d_mrd(p, y, yh, res=res):
            sr, _ = disc.apply_discriminator_r(p, y, res)
            sg, _ = disc.apply_discriminator_r(p, yh, res)
            l = (jnp.mean(jnp.maximum(1.0 - sr, 0.0)) +
                 jnp.mean(jnp.maximum(1.0 + sg, 0.0))) / nres
            return tcfg.mrd_loss_coeff * l, {"disc_mrd": l}

        def g_mrd(p, y, yh, res=res):
            _, fr = disc.apply_discriminator_r(p, y, res)
            sg, fg = disc.apply_discriminator_r(p, yh, res)
            h = jnp.mean(jnp.maximum(1.0 - sg, 0.0)) / nres
            fm = sum(jnp.mean(jnp.abs(a - b))
                     for a, b in zip(fr, fg)) / nres
            return (tcfg.mrd_loss_coeff * (h + fm),
                    {"gen_mrd": h, "fm_mrd": fm})

        units.append((("mrd", i), d_mrd, g_mrd))

    for i, per in enumerate(tcfg.dac_periods):
        def d_dacp(p, y, yh, per=per):
            fr = disc._apply_dac_mpd(p, disc._dac_preprocess(y), per)
            fg = disc._apply_dac_mpd(p, disc._dac_preprocess(yh), per)
            l = (jnp.mean(jnp.square(fg[-1])) +
                 jnp.mean(jnp.square(1.0 - fr[-1])))
            return l, {"disc_dac": l}

        def g_dacp(p, y, yh, per=per):
            fr = disc._apply_dac_mpd(p, disc._dac_preprocess(y), per)
            fg = disc._apply_dac_mpd(p, disc._dac_preprocess(yh), per)
            g = jnp.mean(jnp.square(1.0 - fg[-1]))
            feat = sum(jnp.mean(jnp.abs(a - b))
                       for a, b in zip(fg[:-1], fr[:-1]))
            return g + feat, {"dac_g": g, "dac_feat": feat}

        units.append((("dac", "mpd", i), d_dacp, g_dacp))

    for i, nfft in enumerate(tcfg.dac_fft_sizes):
        def d_dacr(p, y, yh, nfft=nfft):
            fr = disc._apply_dac_mrd(p, disc._dac_preprocess(y), nfft)
            fg = disc._apply_dac_mrd(p, disc._dac_preprocess(yh), nfft)
            l = (jnp.mean(jnp.square(fg[-1])) +
                 jnp.mean(jnp.square(1.0 - fr[-1])))
            return l, {"disc_dac": l}

        def g_dacr(p, y, yh, nfft=nfft):
            fr = disc._apply_dac_mrd(p, disc._dac_preprocess(y), nfft)
            fg = disc._apply_dac_mrd(p, disc._dac_preprocess(yh), nfft)
            g = jnp.mean(jnp.square(1.0 - fg[-1]))
            feat = sum(jnp.mean(jnp.abs(a - b))
                       for a, b in zip(fg[:-1], fr[:-1]))
            return g + feat, {"dac_g": g, "dac_feat": feat}

        units.append((("dac", "mrd", i), d_dacr, g_dacr))

    return units


def _tree_at(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def make_codec_gan_micro(cfg: CodecConfig, tcfg: CodecTrainConfig,
                         tx_g, tx_d, axis_name: Optional[str] = None):
    """The alternating GAN step factored into ~40 SMALL programs so no
    single compile exceeds the tunnel AOT helper's memory budget (the
    deployed-shape split halves' ~800 KB MLIR gets the helper subprocess
    OOM-killed — round-4/5 finding; each micro program is a fraction).

    Exact same math as the fused step (experiment.py:121-218), by two
    identities:
    - the discriminator loss is a sum over param-disjoint
      sub-discriminators, so its gradient is the concatenation of
      per-unit gradients;
    - every generator loss term reaches ``gen_params`` only through
      ``y_hat`` (commit through the VQ), so by the chain rule the
      generator gradient is one VJP of the generator forward pulled back
      on the SUM of per-term cotangents d(term)/d(y_hat).

    Returns a dict of pure functions for the caller to jit:
      keys(step, key) -> (k_vq, bandwidth_id, train_disc)
      gen_infer(gen_params, vq_state, audio, bw) -> (y_c, yh_c)
      disc_unit[u](p_u, y_c, yh_c) -> ((w_loss, logs), grads_u)
      disc_apply(state, grads_list, logs_list, train_disc) -> (state', logs)
      gen_fwd(gen_params, vq_state, audio, bw, k) -> (y_c, yh_c, commit, vq')
      gen_unit[u](p_u, y_c, yh_c) -> (cot_u, w_loss, logs)
      mel_cot(y_c, yh_c) -> (cot, mel)
      combine(adv_cots, mel_c, train_disc) -> cot_total
      gen_vjp(gen_params, vq_state, audio, bw, k, cot) -> grads
      gen_apply(state, grads, vq', adv_ws, unit_logs, mel, commit,
                train_disc) -> (state', logs)
    plus the ordered unit ``paths``."""
    units = _micro_units(tcfg)

    def keys(step, key):
        k_bw, k_vq, _ = jax.random.split(key, 3)
        bandwidth_id = jax.random.randint(k_bw, (), 0,
                                          cfg.adanorm_num_embeddings)
        train_disc = (step >= tcfg.pretrain_mel_steps).astype(jnp.float32)
        return k_vq, bandwidth_id, train_disc

    def _slice_pair(audio, y_hat):
        tlen = min(audio.shape[-1], y_hat.shape[-1])
        return audio[:, :tlen], y_hat[:, :tlen]

    def gen_infer(gen_params, vq_state, audio, bandwidth_id):
        y_hat, _, _ = generator_forward(
            gen_params, vq_state, audio, bandwidth_id, jax.random.PRNGKey(0),
            cfg, tcfg, train=False, axis_name=axis_name)
        return _slice_pair(audio, jax.lax.stop_gradient(y_hat))

    disc_unit = [jax.value_and_grad(dfn, has_aux=True)
                 for _, dfn, _ in units]

    def disc_apply(state, grads_list, logs_list, train_disc):
        # rebuild the full gradient pytree from the ordered unit grads
        tree = {"mpd": [None] * len(tcfg.mpd_periods),
                "mrd": [None] * len(tcfg.mrd_resolutions),
                "dac": {"mpd": [None] * len(tcfg.dac_periods),
                        "mrd": [None] * len(tcfg.dac_fft_sizes)}}
        for (path, _, _), g in zip(units, grads_list):
            sub = tree
            for p in path[:-1]:
                sub = sub[p]
            sub[path[-1]] = g
        tree = jax.tree.map(lambda g: g * train_disc, tree)
        d_updates, opt_d = tx_d.update(tree, state.opt_d, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        mp = sum(l["disc_mp"] for l in logs_list if "disc_mp" in l)
        mrd = sum(l["disc_mrd"] for l in logs_list if "disc_mrd" in l)
        dac_l = sum(l["disc_dac"] for l in logs_list if "disc_dac" in l)
        logs = {"disc_mp": mp, "disc_mrd": mrd, "disc_dac": dac_l,
                "disc_total": mp + tcfg.mrd_loss_coeff * mrd + dac_l}
        return state._replace(disc_params=disc_params, opt_d=opt_d), logs

    def gen_fwd(gen_params, vq_state, audio, bandwidth_id, k_vq):
        y_hat, commit, new_vq = generator_forward(
            gen_params, vq_state, audio, bandwidth_id, k_vq, cfg, tcfg,
            train=True, axis_name=axis_name)
        y_c, yh_c = _slice_pair(audio, y_hat)
        return y_c, yh_c, commit, new_vq

    def _make_gen_unit(gfn):
        def unit(p, y, yh):
            (w, logs), cot = jax.value_and_grad(
                gfn, argnums=2, has_aux=True)(p, y, yh)
            return cot, w, logs
        return unit

    gen_unit = [_make_gen_unit(gfn) for _, _, gfn in units]

    def mel_cot(y_c, yh_c):
        def f(yh):
            return losses.mel_loss(yh, y_c, sample_rate=tcfg.sample_rate)
        mel, cot = jax.value_and_grad(f)(yh_c)
        return cot, mel

    def combine(adv_cots, mcot, train_disc):
        adv = adv_cots[0]
        for c in adv_cots[1:]:
            adv = adv + c
        return train_disc * adv + tcfg.mel_loss_coeff * mcot

    def gen_vjp(gen_params, vq_state, audio, bandwidth_id, k_vq, cot):
        def f(gp):
            y_hat, commit, _ = generator_forward(
                gp, vq_state, audio, bandwidth_id, k_vq, cfg, tcfg,
                train=True, axis_name=axis_name, remat=True)
            _, yh_c = _slice_pair(audio, y_hat)
            return yh_c, commit
        _, vjp_fn = jax.vjp(f, gen_params)
        (g,) = vjp_fn((cot, jnp.float32(tcfg.commit_loss_coeff)))
        return g

    def gen_apply(state, grads, new_vq, adv_ws, unit_logs, mel, commit,
                  train_disc):
        g_updates, opt_g = tx_g.update(grads, state.opt_g, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        adv_w = adv_ws[0]
        for w in adv_ws[1:]:
            adv_w = adv_w + w
        total = (train_disc * adv_w + tcfg.mel_loss_coeff * mel +
                 tcfg.commit_loss_coeff * commit)
        logs = {"grad_norm_gen": optax.global_norm(grads),
                "gen_total": total, "mel": mel, "commit": commit}
        for k in ("gen_mp", "gen_mrd", "fm_mp", "fm_mrd", "dac_g",
                  "dac_feat"):
            logs[k] = sum(l[k] for l in unit_logs if k in l)
        new_state = state._replace(gen_params=gen_params, vq_state=new_vq,
                                   opt_g=opt_g, step=state.step + 1)
        return new_state, logs

    return {"paths": [p for p, _, _ in units], "keys": keys,
            "gen_infer": gen_infer, "disc_unit": disc_unit,
            "disc_apply": disc_apply, "gen_fwd": gen_fwd,
            "gen_unit": gen_unit, "mel_cot": mel_cot, "combine": combine,
            "gen_vjp": gen_vjp, "gen_apply": gen_apply}


def make_codec_gan_step(cfg: CodecConfig, tcfg: CodecTrainConfig,
                        tx_g, tx_d, axis_name: Optional[str] = None):
    """The fused single-program alternating step: disc update then gen
    update against the updated discriminators (experiment.py:86-218).

    Kept for parity testing and small configs; `CodecTrainer` defaults to
    the split pair because the deployed-shape fused program's ~4.8 MB
    MLIR gets the tunnel's AOT compile helper OOM-killed (round-4 finding
    — each half compiles fine)."""
    disc_step, gen_step = make_codec_gan_steps(cfg, tcfg, tx_g, tx_d,
                                               axis_name)

    def step(state: CodecTrainState, audio: jnp.ndarray, key: jax.Array):
        state, d_logs = disc_step(state, audio, key)
        state, g_logs = gen_step(state, audio, key)
        return state, {**d_logs, **g_logs}

    return step


class CodecTrainer:
    """Driver: mesh placement, jitted GAN step, checkpoints, metrics."""

    def __init__(self, cfg: CodecConfig, tcfg: CodecTrainConfig, mesh=None):
        self.cfg, self.tcfg = cfg, tcfg
        self.mesh = mesh or pmesh.create_mesh(tcfg.dp_size, 1)
        self.rng = jax.random.PRNGKey(tcfg.seed)

        k1, k2, k3, self.rng = jax.random.split(self.rng, 4)
        gen_params = init_generator_params(k1, cfg)
        disc_params = init_discriminator_params(k2, tcfg)
        vq_state = init_vq_state(k3, cfg.vq_bins, cfg.vq_dim)

        sched = warmup_cosine_lr(tcfg)
        self.tx_g = optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2)
        self.tx_d = optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2)

        rep = replicated(self.mesh)
        self.bsh = batch_sharding(self.mesh)
        gen_params = jax.device_put(gen_params, rep)
        disc_params = jax.device_put(disc_params, rep)
        vq_state = jax.device_put(vq_state, rep)
        opt_g = jax.jit(self.tx_g.init, out_shardings=rep)(gen_params)
        opt_d = jax.jit(self.tx_d.init, out_shardings=rep)(disc_params)
        self.state = CodecTrainState(gen_params, disc_params, vq_state,
                                     opt_g, opt_d, jnp.int32(0))
        # Compilation granularity ladder (tcfg.step_impl):
        # - "fused": one program (small configs / parity tests);
        # - "split": two programs at the optimizer boundary — the fused
        #   step's ~4.8 MB MLIR gets the tunnel AOT compile helper
        #   OOM-killed at deployed shapes (test_split_step_matches_fused);
        # - "micro": ~40 per-sub-discriminator programs — at the deployed
        #   batch-40 x 3 s shape even each HALF's ~800 KB MLIR kills the
        #   helper, and the losses factor exactly
        #   (test_micro_step_matches_fused).
        if tcfg.step_impl == "micro":
            m = make_codec_gan_micro(cfg, tcfg, self.tx_g, self.tx_d)
            self._m_paths = m["paths"]
            self._m_keys = jax.jit(m["keys"])
            self._m_gen_infer = jax.jit(m["gen_infer"])
            self._m_disc_unit = [jax.jit(u) for u in m["disc_unit"]]
            self._m_disc_apply = jax.jit(m["disc_apply"],
                                         donate_argnums=(0,))
            self._m_gen_fwd = jax.jit(m["gen_fwd"])
            self._m_gen_unit = [jax.jit(u) for u in m["gen_unit"]]
            self._m_mel_cot = jax.jit(m["mel_cot"])
            self._m_combine = jax.jit(m["combine"], donate_argnums=(0, 1))
            self._m_gen_vjp = jax.jit(m["gen_vjp"], donate_argnums=(5,))
            self._m_gen_apply = jax.jit(m["gen_apply"],
                                        donate_argnums=(0, 1))
        elif tcfg.step_impl == "fused":
            self._fused_step = jax.jit(make_codec_gan_step(
                cfg, tcfg, self.tx_g, self.tx_d), donate_argnums=(0,))
        else:
            disc_step, gen_step = make_codec_gan_steps(
                cfg, tcfg, self.tx_g, self.tx_d)
            self._disc_step = jax.jit(disc_step, donate_argnums=(0,))
            self._gen_step = jax.jit(gen_step, donate_argnums=(0,))
        self.iter_num = 0

    def _step_micro(self, audio: jnp.ndarray, key: jax.Array):
        st = self.state
        k_vq, bw, train_disc = self._m_keys(st.step, key)
        # --- optimizer 0: per-unit disc grads, one combined update ----
        y_c, yh_c = self._m_gen_infer(st.gen_params, st.vq_state, audio, bw)
        outs = [u(_tree_at(st.disc_params, p), y_c, yh_c)
                for u, p in zip(self._m_disc_unit, self._m_paths)]
        st, d_logs = self._m_disc_apply(
            st, [g for _, g in outs], [o[0][1] for o in outs], train_disc)
        # --- optimizer 1: cotangents at y_hat vs the UPDATED
        # discriminators, one generator VJP -----------------------------
        y_c, yh_c, commit, new_vq = self._m_gen_fwd(
            st.gen_params, st.vq_state, audio, bw, k_vq)
        cots, ws, glogs = [], [], []
        for u, p in zip(self._m_gen_unit, self._m_paths):
            c, w, lg = u(_tree_at(st.disc_params, p), y_c, yh_c)
            cots.append(c)
            ws.append(w)
            glogs.append(lg)
        mcot, mel = self._m_mel_cot(y_c, yh_c)
        cot = self._m_combine(cots, mcot, train_disc)
        grads = self._m_gen_vjp(st.gen_params, st.vq_state, audio, bw,
                                k_vq, cot)
        st, g_logs = self._m_gen_apply(st, grads, new_vq, ws, glogs, mel,
                                       commit, train_disc)
        self.state = st
        return {**d_logs, **g_logs}

    def step(self, audio: np.ndarray) -> Dict[str, float]:
        key, self.rng = jax.random.split(self.rng)
        audio = jax.device_put(jnp.asarray(audio, jnp.float32), self.bsh)
        if self.tcfg.step_impl == "micro":
            logs = self._step_micro(audio, key)
        elif self.tcfg.step_impl == "fused":
            self.state, logs = self._fused_step(self.state, audio, key)
        else:
            self.state, d_logs = self._disc_step(self.state, audio, key)
            self.state, g_logs = self._gen_step(self.state, audio, key)
            logs = {**d_logs, **g_logs}
        self.iter_num += 1
        return {k: float(v) for k, v in logs.items()}

    def validation_metrics(self, audio: np.ndarray,
                           full: bool = False) -> Dict[str, float]:
        """Mel distance + commit on held-out audio (experiment.py:227-258;
        UTMOS/PESQ plug in externally when their models are present)."""
        key = jax.random.PRNGKey(0)
        y = jnp.asarray(audio, jnp.float32)
        y_hat, _, _ = generator_forward(
            self.state.gen_params, self.state.vq_state, y, jnp.int32(0),
            key, self.cfg, self.tcfg, train=False)
        tlen = min(y.shape[-1], y_hat.shape[-1])
        mel = losses.mel_loss(y_hat[:, :tlen], y[:, :tlen],
                              sample_rate=self.tcfg.sample_rate)
        out = {"val_mel_loss": float(mel)}
        if full:
            # periodicity/pitch/F1 (+ PESQ/UTMOS when their models are
            # installed) — the reference's val metric set
            # (experiment.py:227-309, metrics/periodicity.py)
            from llmvox_tpu.codec import metrics as cm
            yh = np.asarray(y_hat[:, :tlen])
            yy = np.asarray(y[:, :tlen])
            agg = {}
            for i in range(yh.shape[0]):
                for k, v in cm.evaluate_pair(
                        yh[i], yy[i],
                        sample_rate=self.tcfg.sample_rate).items():
                    if v is not None:
                        agg.setdefault(k, []).append(float(v))
            out.update({f"val_{k}": float(np.mean(v))
                        for k, v in agg.items()})
        return out

    def reconstruct(self, audio: np.ndarray) -> np.ndarray:
        """Copy-synthesize a batch with the current generator (for audio
        logging during validation, experiment.py:195-216)."""
        y = jnp.asarray(audio, jnp.float32)
        y_hat, _, _ = generator_forward(
            self.state.gen_params, self.state.vq_state, y, jnp.int32(0),
            jax.random.PRNGKey(0), self.cfg, self.tcfg, train=False)
        return np.asarray(y_hat)

    def save_checkpoint(self, tag: str = "codec_ckpt") -> str:
        out = self.tcfg.out_dir
        path = os.path.join(out, f"{tag}.npz")
        if pmesh.is_master():
            state = jax.device_get(self.state)
            ckpt.save_params_npz(path, {
                "gen": state.gen_params,
                "vq": state.vq_state._asdict(),
            }, meta={"iter_num": self.iter_num})
            ckpt.save_opaque(os.path.join(out, f"{tag}.disc.npz"),
                             state.disc_params)
            ckpt.save_opaque(os.path.join(out, f"{tag}.opt.npz"),
                             (state.opt_g, state.opt_d))
        return path

    def export_inference_params(self) -> Dict:
        """Fold weight norms -> WavCodec-compatible inference params."""
        state = jax.device_get(self.state)
        gen = state.gen_params

        def fold(p):
            if isinstance(p, dict) and "v" in p:
                import numpy as _np
                from llmvox_tpu.ops.nn import effective_weight
                return {"w": _np.asarray(effective_weight(p)),
                        "b": _np.asarray(p["b"])}
            if isinstance(p, dict):
                return {k: fold(v) for k, v in p.items()}
            if isinstance(p, list):
                return [fold(v) for v in p]
            return p

        return {
            "codebooks": np.asarray(state.vq_state.embed)[None],
            "backbone": gen["backbone"],
            "head": gen["head"],
            "encoder": fold(gen["encoder"]),
        }

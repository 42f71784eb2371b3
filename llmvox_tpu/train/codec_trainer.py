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
                      axis_name: Optional[str] = None):
    """audio (B, T) -> (audio_hat (B, T'), commit_loss, new_vq_state)."""
    emb = seanet.apply_seanet_encoder(gen_params["encoder"], audio, cfg)
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
    h = bb.apply_backbone(gen_params["backbone"], features, bandwidth_id, cfg)
    audio_hat = heads.apply_istft_head(gen_params["head"], h, cfg)
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
        # Two jitted programs, not one: the fused alternating step's
        # ~4.8 MB MLIR gets the tunnel AOT compile helper OOM-killed at
        # deployed shapes; each optimizer half compiles fine and the
        # chain traces the same math (test_split_step_matches_fused).
        disc_step, gen_step = make_codec_gan_steps(
            cfg, tcfg, self.tx_g, self.tx_d)
        self._disc_step = jax.jit(disc_step, donate_argnums=(0,))
        self._gen_step = jax.jit(gen_step, donate_argnums=(0,))
        self.iter_num = 0

    def step(self, audio: np.ndarray) -> Dict[str, float]:
        key, self.rng = jax.random.split(self.rng)
        audio = jax.device_put(jnp.asarray(audio, jnp.float32), self.bsh)
        self.state, d_logs = self._disc_step(self.state, audio, key)
        self.state, g_logs = self._gen_step(self.state, audio, key)
        self.iter_num += 1
        return {k: float(v) for k, v in {**d_logs, **g_logs}.items()}

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

"""GuidedAttentionPipeline: the guided denoising loop as one XLA program.

The reference's hot path (reference pipeline_guided_attention.py:925-1053) is
a Python loop that, per step: runs a grad-enabled cond-only UNet forward,
aggregates attention maps from a mutated global store, computes losses in
Python loops, calls torch.autograd.grad on the latent, optionally spins a
refinement while-loop of more forwards (pipeline:475-581), runs a batch-2
CFG forward, steps DDIM, and possibly re-noises and repeats ("time travel",
pipeline:1044-1053) — with host syncs (.item(), PNG writes) inside the loop.

Here the entire thing is a single `lax.scan` over steps, jitted once:

  * the cond-only forward + loss is a pure function of the latent; the
    latent update is `jax.grad` of it;
  * iterative refinement is a bounded `lax.while_loop` whose condition is
    the same per-sub-prompt threshold test (pipeline:1074-1088);
  * re-noise recursion is a bounded `lax.while_loop` around the step body;
  * every diagnostic the reference logs/saves is returned as stacked
    per-step arrays and materialized host-side afterwards (runtime/artifacts).

Step-count parity (reference defaults): guidance forwards happen only on
steps that can update the latent when `skip_inert_guidance_passes` is on —
the reference burns one grad-enabled forward per step even when no update
can occur (pipeline:946 with only_update_on_threshold_steps=True).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.guidance.losses import (
    compute_loss,
    compute_token_stats,
    meets_threshold,
    per_token_losses,
)
from guided_attention_tpu.guidance.spec import GuidanceSpec
from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.schedulers.ddim import DDIMSchedule, ddim_step, renoise


def sgd_momentum_update(v, grad, vel, lr):
    """One refinement SGD step (reference pipeline:495-497, 549-553):
    ``torch.optim.SGD([latents], lr=step_size/2.5, momentum=0.8)`` —
    buf = 0.8*buf + grad; v -= (lr/2.5)*buf. torch initializes the momentum
    buffer to the first grad, which equals 0.8*0 + grad here. Pinned
    numerically against torch.optim.SGD over a multi-step sequence in
    tests/test_whole_step_parity.py::test_use_optimizer_sgd_parity."""
    vel2 = (0.8 * vel + grad).astype(v.dtype)
    return (v - (lr / 2.5) * vel2).astype(v.dtype), vel2


def plain_update(v, grad, lr, loss):
    """The reference's ``_update_latent`` (pipeline:455-470): v - lr*grad,
    applied only when loss != 0 (pipeline:551-553, 1003-1007). Deep mode
    passes lr = step_size*200 (the x200 grad scale at pipeline:464)."""
    return jnp.where(loss != 0.0, (v - lr * grad).astype(v.dtype), v)


@dataclasses.dataclass(frozen=True)
class GenStatics:
    """Trace-time constants of one generation program."""

    num_steps: int = 50
    guidance_scale: float = 7.5
    attention_res: int = 16
    smooth_attentions: bool = True
    sigma: float = 0.5
    kernel_size: int = 3
    max_refinement_steps: int = 10
    run_standard_sd: bool = False
    skip_inert_guidance_passes: bool = True
    sub_prompt_avg_within: bool = False
    only_update_on_threshold_steps: bool = True
    max_iter_to_alter: int = 25
    # DDIM eta (stochastic variance scale; reference threads it via
    # prepare_extra_step_kwargs into scheduler.step, pipeline:906, 1027-1029).
    # 0.0 (the reference's effective default) compiles the deterministic step.
    eta: float = 0.0
    last_threshold: float = 1.0  # meets_threshold(-1, ...) value (pipeline:1083)
    capture_step_maps: bool = True  # return final-eval maps per step
    # per-refinement-slot UNSMOOTHED maps (reference dumps a PNG per token
    # per eval, pipeline:239-245); heavy output, off by default
    capture_eval_maps: bool = False
    # Rematerialize the guidance eval's forward during its backward
    # (jax.checkpoint): trades ~1 extra truncated forward per eval for not
    # holding the fwd activations in HBM — the knob for large-batch HBM
    # pressure (docs/PERF.md seed-batch table, batch >= 16).
    remat_guidance_eval: bool = False
    # per-refinement-slot latents (f16): lets artifacts decode a
    # 'pred_pre_optim' x0 image per SUBITERATION post-hoc — the reference
    # saves one from a fresh in-loop forward per refinement subiter at
    # diag>0 (pipeline:517-535). Off by default (~0.4 MB/step when on).
    capture_eval_latents: bool = False
    # 0 = minimal StepDiag (loss scalars + control-flow counters only; the
    # bulky per-step tensors shrink to unit placeholders so the scan output
    # — and the host transfer on remote-attached TPUs — is a few KB per
    # image); 1 = full per-step diagnostics (reference parity: log lines,
    # step maps, x0 preds, latent stats are all derivable host-side)
    diag_level: int = 1


@struct.dataclass
class StepArrays:
    """Per-step arrays indexed by the scan step i (all length S)."""

    step_sizes: jnp.ndarray  # f32[S] scale_factor * sqrt(linspace(scale_range))
    thresholds: jnp.ndarray  # f32[S], +inf where i not in thresholds
    update_gate: jnp.ndarray  # bool[S] (pipeline:998)
    guidance_needed: jnp.ndarray  # bool[S] — forward can matter at this step
    pww_gates: jnp.ndarray  # f32[S] — (i < pww_stop) * log1p(sigma_i)


def guidance_gates(statics: GenStatics, hp: HyperParams):
    """Host-side per-step gates (numpy): (thresholds[S], update_gate[S],
    guidance_needed[S]). guidance_needed marks the only steps whose scan
    iteration can run a guidance eval when skip_inert_guidance_passes is on
    — which also makes it the exact set of steps that can carry nonzero
    diagnostics (maps, eval slots): the basis for pull-time trimming
    (runner._trim_plan) as well as make_step_arrays."""
    S = statics.num_steps
    thresholds = np.full(S, np.inf, np.float32)
    for k, v in hp.thresholds.items():
        if 0 <= int(k) < S:
            thresholds[int(k)] = v
    is_thresh = np.isfinite(thresholds)
    update_gate = is_thresh.copy()
    if not statics.only_update_on_threshold_steps:
        update_gate |= np.arange(S) < statics.max_iter_to_alter
    guidance_needed = is_thresh | update_gate
    return thresholds, update_gate, guidance_needed


def make_step_arrays(
    statics: GenStatics, hp: HyperParams, sched: DDIMSchedule, scale_factor: float, scale_range
) -> StepArrays:
    S = statics.num_steps
    rng = np.linspace(scale_range[0], scale_range[1], S)
    step_sizes = scale_factor * np.sqrt(rng)
    thresholds, update_gate, guidance_needed = guidance_gates(statics, hp)
    sig = np.asarray(sched.sigmas)
    pww = (np.arange(S) < hp.paint_with_words_stop).astype(np.float32) * np.log1p(sig)
    return StepArrays(
        step_sizes=jnp.asarray(step_sizes, jnp.float32),
        thresholds=jnp.asarray(thresholds),
        update_gate=jnp.asarray(update_gate),
        guidance_needed=jnp.asarray(guidance_needed),
        pww_gates=jnp.asarray(pww, jnp.float32),
    )


@struct.dataclass
class StepDiag:
    """Per-step diagnostics (stacked by the scan) — the pure-output
    replacement for the reference's in-loop logging/PNG dumps
    (helpers.py:292-349, pipeline:1096-1123)."""

    total_loss: jnp.ndarray
    group_unscaled: jnp.ndarray  # [G]
    per_token_unscaled: jnp.ndarray  # [K]
    token_attn_sum: jnp.ndarray  # [K] (pipeline:241-246 log)
    col: jnp.ndarray  # [K]
    row: jnp.ndarray  # [K]
    max_attn: jnp.ndarray  # [K]
    refine_iters: jnp.ndarray  # int32 — last recursion's refinement subiters
    n_evals: jnp.ndarray  # int32 — guidance fwd+bwd evals, CUMULATIVE over recursions
    did_update: jnp.ndarray  # bool
    recursions: jnp.ndarray  # int32
    latent_mean: jnp.ndarray  # [C]
    latent_std: jnp.ndarray  # [C] (std of |latent|, helpers.py:323)
    latent_p99: jnp.ndarray  # [C] (99th pct of |latent|)
    x0_pred: jnp.ndarray  # [h, w, C]
    latent_in: jnp.ndarray  # [h, w, C] — step-entry latents, enables post-hoc
    # per-head map re-runs (runtime/artifacts.save_individual_ca_maps)
    maps: jnp.ndarray  # [R, R, K] final-eval smoothed maps (or zeros)
    eval_unscaled: jnp.ndarray  # [R_sub, K] per-slot per-token unscaled
    eval_mask: jnp.ndarray  # bool[R_sub]
    eval_maps: jnp.ndarray  # f16[R_sub, R, R, K] per-slot probs (or [1,1,1,1])
    eval_latents: jnp.ndarray  # f16[R_sub, h, w, C] per-slot pre-update latents (or unit)


def aggregate_cross_maps(maps: Dict[str, Any], res: int, from_where=("up", "down", "mid")):
    """Mean over layers+heads of captured cross maps at ``res`` -> [R,R,K]
    (reference utils/ptp_utils.py:273-289 with select=0; heads already
    averaged inside the attention op)."""
    items = []
    for place in from_where:
        items.extend(maps[f"{place}_cross"])
    stacked = jnp.concatenate([m[0][None] for m in items], axis=0)  # [L, Q, K]
    out = jnp.mean(stacked, axis=0)
    K = out.shape[-1]
    return out.reshape(res, res, K)


def build_generate_raw(
    sd: StableDiffusion,
    statics: GenStatics,
    hp: HyperParams,
    from_where: Tuple[str, ...] = ("up", "down", "mid"),
    segment_len: Optional[int] = None,
):
    """Returns the un-jitted ``generate(params, emb, latents0, spec, sched,
    arrays, key) -> (final_latents, StepDiag[S])`` for batch size 1 —
    vmap/shard it for batches (parallel/batch.py) or jit directly
    (build_generate).

    ``segment_len=L`` instead returns ``generate(..., key, start)`` scanning
    the L steps [start, start+L) — the building block for mid-run
    checkpoint/resume (runtime/checkpoint.py). ``start`` is a TRACED
    argument: one compiled program serves every segment of length L (cold
    compiles ride a slow tunnel on remote-attached TPUs — a program per
    (start, stop) pair would multiply that cost by S/L). Exactness:
    everything per-step is indexed by the ABSOLUTE step i (timesteps,
    StepArrays gathers, and every in-scan PRNG stream derives via
    fold_in(key, i)), so chaining segments reproduces the full-range scan
    bit-for-bit. latents0 must be the latent entering ``start``; the
    returned diags stack L steps."""
    unet = sd.unet
    R = statics.attention_res
    S = statics.num_steps
    if segment_len is not None and not 0 < segment_len <= S:
        raise ValueError(f"segment_len {segment_len} outside [1, {S}]")
    R_sub = statics.max_refinement_steps + 2
    K = 77
    capture = frozenset({("cross", R)})
    do_cfg = statics.guidance_scale > 1.0
    recurse_steps = max(int(hp.recurse_steps), 1)
    recurse_until = int(hp.recurse_until)
    guided_mode = not statics.run_standard_sd
    deep_mode = bool(hp.optimize_deep_latent) and guided_mode
    ucfg = sd.config.unet
    _deep_res = ucfg.sample_size // 2 ** (len(ucfg.block_out_channels) - 1)
    deep_shape = (1, _deep_res, _deep_res, ucfg.block_out_channels[-1])

    def _zero_deep():
        return jnp.zeros(deep_shape, ucfg.dtype)

    _eval_maps_shape = (R_sub, R, R, K) if statics.capture_eval_maps else (1, 1, 1, 1)

    def _zero_eval_maps():
        return jnp.zeros(_eval_maps_shape, jnp.float16)

    _eval_lat_shape = (
        (R_sub, ucfg.sample_size, ucfg.sample_size, ucfg.in_channels)
        if statics.capture_eval_latents
        else (1, 1, 1, 1)
    )

    def _zero_eval_lats():
        return jnp.zeros(_eval_lat_shape, jnp.float16)

    def generate(params, emb, latents0, spec: GuidanceSpec, sched: DDIMSchedule, arrays: StepArrays, key, start=0):
        uncond, cond = emb[0:1], emb[1:2]
        pww = spec.pww_masks if spec.pww_masks else None
        C = latents0.shape[-1]

        def unet_eps(latents, t, context, cap=frozenset(), gate=None, deep_inject=None, deep_gate=None):
            eps, aux = unet.apply(
                {"params": params["unet"]},
                latents,
                t,
                context,
                capture=cap,
                pww=pww,
                pww_gate=gate,
                deep_inject=deep_inject,
                deep_inject_gate=deep_gate,
            )
            return eps, aux

        def guidance_eval(base_latents, t, gate, var):
            """Pure loss of the optimization variable ``var`` through the
            cond-only UNet (the reference's grad-enabled forward + loss,
            pipeline:946-973). Normal mode: ``var`` is the current latent.
            Deep mode (hp.optimize_deep_latent): ``var`` is the injected
            bottleneck features, ``base_latents`` stays fixed, and losses
            aggregate "up" maps only (pipeline:306-307)."""
            agg_from = ("up",) if deep_mode else from_where

            def loss_fn(v):
                if deep_mode:
                    _eps, aux = unet_eps(base_latents, t, cond, capture, gate, deep_inject=v)
                else:
                    _eps, aux = unet_eps(v, t, cond, capture, gate)
                maps = aggregate_cross_maps(aux["maps"], R, agg_from)
                stats = compute_token_stats(
                    maps, spec, hp, statics.smooth_attentions, statics.sigma, statics.kernel_size
                )
                total, gs, gu, valid = compute_loss(
                    stats, spec, hp, statics.sub_prompt_avg_within
                )
                _scaled, unscaled = per_token_losses(stats, spec, hp)
                aux_out = {
                    "gu": gu,
                    "valid": valid,
                    "unscaled_tok": unscaled,
                    "attn_sum": jnp.sum(stats.probs, axis=(0, 1)),
                    "col": stats.col,
                    "row": stats.row,
                    "max_attn": stats.max_attn,
                    "maps": stats.smoothed if statics.capture_step_maps else jnp.zeros((R, R, K)),
                }
                if statics.capture_eval_maps:
                    # the reference dumps the UNsmoothed re-softmaxed map per
                    # eval (pipeline:239-245)
                    aux_out["probs16"] = stats.probs.astype(jnp.float16)
                return total, aux_out

            fn = jax.checkpoint(loss_fn) if statics.remat_guidance_eval else loss_fn
            return jax.value_and_grad(fn, has_aux=True)(var)

        def zero_eval_aux():
            return {
                "gu": jnp.zeros((spec.n_groups,)),
                "valid": jnp.zeros((spec.n_groups,), bool),
                "unscaled_tok": jnp.zeros((K,)),
                "attn_sum": jnp.zeros((K,)),
                "col": jnp.zeros((K,)),
                "row": jnp.zeros((K,)),
                "max_attn": jnp.zeros((K,)),
                "maps": jnp.zeros((R, R, K)),
            } | (
                {"probs16": jnp.zeros((R, R, K), jnp.float16)}
                if statics.capture_eval_maps
                else {}
            )

        def guided_update(latents, i, t, gate):
            """Refinement + gradient update for one step (pipeline:961-1007).

            Operates on the optimization variable ``var``: the latent in
            normal mode, the captured bottleneck features in deep mode
            (whose gradient is scaled x200, pipeline:464). Returns the
            (possibly updated) latent AND the final deep features."""
            step_size = arrays.step_sizes[i]
            lr = step_size * 200.0 if deep_mode else step_size
            thresh_i = arrays.thresholds[i]
            eval_buf = jnp.zeros((R_sub, K))
            eval_mask = jnp.zeros((R_sub,), bool)
            eval_maps0 = _zero_eval_maps()
            eval_lats0 = _zero_eval_lats()

            if deep_mode:
                # fresh capture of the bottleneck (reference pipeline:704,
                # injectDeepFeatures reset per step at :935); injecting the
                # just-captured features reproduces that same forward
                _eps0, cap0 = unet_eps(latents, t, cond, frozenset(), gate)
                var = cap0["deep"]
            else:
                var = latents

            # ONE while_loop hosts the initial evaluation (phase 0 — reference
            # pipeline:961-973), the refinement bodies (phase 1, eval-then-
            # update — pipeline:501-553), AND the final fresh no-update
            # forward after refinement (phase 2 — pipeline:564-578). A single
            # UNet fwd+bwd instance lives in the compiled step body instead of
            # three; the serialized executable (which rides the remote-TPU
            # tunnel on every cold start) shrinks accordingly.
            PH_EVAL0, PH_REFINE, PH_FINAL, PH_DONE = 0, 1, 2, 3

            def zero_grad():
                return jnp.zeros_like(var)

            def loop_cond(c):
                return c[0] < PH_DONE

            def loop_body(c):
                (phase, n_ref, n_ev, v, needs, a0, l_fin, g_fin, a_fin, buf, mask, mbuf, lbuf, vel) = c
                n_ev = n_ev + 1  # every body iteration is one guidance fwd+bwd
                (loss, aux), grad = guidance_eval(latents, t, gate, v)
                first = phase == PH_EVAL0
                refining = phase == PH_REFINE
                final = phase == PH_FINAL
                met = meets_threshold(aux["gu"], aux["valid"], thresh_i)

                # eval slots: 0 = eval0, 1..max = refinement, R_sub-1 = final
                slot = jnp.where(first, 0, jnp.where(final, R_sub - 1, n_ref + 1))
                buf = jax.lax.dynamic_update_index_in_dim(buf, aux["unscaled_tok"], slot, 0)
                mask = jax.lax.dynamic_update_index_in_dim(mask, jnp.asarray(True), slot, 0)
                if statics.capture_eval_maps:
                    mbuf = jax.lax.dynamic_update_index_in_dim(mbuf, aux["probs16"], slot, 0)
                if statics.capture_eval_latents:
                    # pre-update latent at this eval (reference decodes it as
                    # pred_pre_optim per subiteration, pipeline:517-535); in
                    # deep mode the latent is fixed during refinement
                    cur_lat = latents if deep_mode else v
                    lbuf = jax.lax.dynamic_update_index_in_dim(
                        lbuf, cur_lat[0].astype(jnp.float16), slot, 0
                    )

                needs2 = jnp.where(first, ~met, needs)
                # eval0's stats feed the stale threshold gate (pipeline:999)
                a0 = jax.tree_util.tree_map(lambda new, old: jnp.where(first, new, old), aux, a0)

                # latent/deep update happens only on refinement bodies
                if hp.use_optimizer:
                    # SGD + momentum via sgd_momentum_update (pinned vs
                    # torch.optim.SGD in tests/test_whole_step_parity.py).
                    # Documented deviation for use_optimizer+optimize_deep_latent
                    # combined: the reference's SGD holds [latents] (:497) even
                    # in deep mode, so its optim.step() there updates LATENTS
                    # through the skip-connection grads while deepFeatures only
                    # move at the final :1003 update — almost certainly
                    # unintended; here the optimizer consistently drives the
                    # declared optimization variable (deep features). The
                    # numeric divergence is asserted explicitly in
                    # tests/test_whole_step_parity.py::test_deep_mode_sgd_deviation.
                    v_new, vel_new = sgd_momentum_update(v, grad, vel, lr)
                    vel2 = jnp.where(refining, vel_new, vel)
                    v_upd = v_new
                else:
                    vel2 = vel
                    v_upd = plain_update(v, grad, lr, loss)
                v2 = jnp.where(refining, v_upd, v)
                n_ref2 = n_ref + jnp.where(refining, 1, 0).astype(jnp.int32)

                # the eval whose results flow onward: eval0 when no refinement
                # is needed, else the final fresh forward
                set_fin = jnp.logical_or(jnp.logical_and(first, met), final)
                l_fin = jnp.where(set_fin, loss, l_fin)
                g_fin = jnp.where(set_fin, grad, g_fin)
                a_fin = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(set_fin, new, old), aux, a_fin
                )

                # refinement continues while the latest eval misses the
                # threshold and the iteration budget remains (pipeline:501,
                # 560-562), then one final forward; a zero budget skips
                # straight to the final forward without any update (documented
                # deviation: the reference checks `iteration >= max` only
                # AFTER the body, so max=0 would still run one eval+update —
                # unreachable from its config, which hardcodes 10 at :992)
                after_eval0 = PH_REFINE if statics.max_refinement_steps > 0 else PH_FINAL
                phase2 = jnp.where(
                    first,
                    jnp.where(met, PH_DONE, after_eval0),
                    jnp.where(
                        final,
                        PH_DONE,
                        jnp.where(
                            jnp.logical_or(met, n_ref2 >= statics.max_refinement_steps),
                            PH_FINAL,
                            PH_REFINE,
                        ),
                    ),
                )
                return (phase2, n_ref2, n_ev, v2, needs2, a0, l_fin, g_fin, a_fin, buf, mask, mbuf, lbuf, vel2)

            init = (
                jnp.int32(PH_EVAL0),
                jnp.int32(0),
                jnp.int32(0),
                var,
                jnp.asarray(False),
                zero_eval_aux(),
                jnp.zeros(()),
                zero_grad(),
                zero_eval_aux(),
                eval_buf,
                eval_mask,
                eval_maps0,
                eval_lats0,
                jnp.zeros_like(var),
            )
            (
                _phase,
                refine_iters,
                n_evals,
                var1,
                needs_refine,
                aux0,
                loss1,
                grad1,
                aux1,
                eval_buf,
                eval_mask,
                eval_maps,
                eval_lats,
                _vel,
            ) = jax.lax.while_loop(loop_cond, loop_body, init)

            # gradient update gate (pipeline:998-1007); meets_threshold(-1,...)
            # uses the LAST threshold value (pipeline:1083) and — reference
            # parity — the STALE pre-refinement unscaled losses (the
            # reference's `unscaled_losses` at :999 is not reassigned by the
            # refinement call at :981), while the update itself uses the
            # post-refinement gradient.
            gate_step = arrays.update_gate[i]
            not_met_last = ~meets_threshold(aux0["gu"], aux0["valid"], statics.last_threshold)
            apply = jnp.logical_and(gate_step, not_met_last)
            var2 = jnp.where(apply, plain_update(var1, grad1, lr, loss1), var1)
            did_update = jnp.logical_or(needs_refine, apply)
            # entered_refine gates the deep-feature CFG injection: the
            # reference clears injectDeepFeatures at step start (:935) and
            # only the refinement call sets it (:514), so an apply-only deep
            # update is computed but NOT injected that step
            if deep_mode:
                return latents, var2, did_update, needs_refine, loss1, aux1, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats
            return var2, _zero_deep(), did_update, needs_refine, loss1, aux1, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats

        def _cfg_eps(latents, t, gate, deep_inject=None, deep_gate=None):
            if do_cfg:
                pair = jnp.concatenate([latents, latents], axis=0)
                ctx = jnp.concatenate([uncond, cond], axis=0)
                eps_pair, _ = unet_eps(pair, t, ctx, frozenset(), gate, deep_inject, deep_gate)
                eps_u, eps_c = eps_pair[0:1], eps_pair[1:2]
                return eps_u + statics.guidance_scale * (eps_c - eps_u)
            eps, _ = unet_eps(latents, t, cond, frozenset(), gate, deep_inject, deep_gate)
            return eps

        def cfg_and_step(latents, i, t, gate, deep, use_deep, eta_key):
            """Batch-2 CFG forward + DDIM (pipeline:1010-1029). In deep mode
            the CFG pass injects the optimized bottleneck features only when
            refinement ran this step (reference injectDeepFeatures: cleared
            at :935, set only by the refinement call at :514); the injection
            is a traced gate inside ONE UNet instance, not a lax.cond over
            two (which would double the step executable)."""
            if deep_mode:
                eps = _cfg_eps(latents, t, gate, deep, use_deep)
            else:
                eps = _cfg_eps(latents, t, gate)
            prev, x0 = ddim_step(
                sched, i, eps.astype(jnp.float32), latents.astype(jnp.float32),
                eta=statics.eta, key=eta_key,
            )
            return prev, x0

        def zero_guidance_outputs():
            """Zero stand-in for guided_update's outputs after the latent —
            the ONE definition the skip/non-guided branches share (lax.cond
            requires structurally identical pytrees on both sides)."""
            return (
                _zero_deep(),
                jnp.asarray(False),  # did_update
                jnp.asarray(False),  # entered_refine
                jnp.zeros(()),  # loss
                zero_eval_aux(),
                jnp.int32(0),  # refine_iters
                jnp.int32(0),  # n_evals
                jnp.zeros((R_sub, K)),
                jnp.zeros((R_sub,), bool),
                _zero_eval_maps(),
                _zero_eval_lats(),
            )

        def one_pass(latents, i, t, gate, eta_key):
            """guidance + CFG + scheduler for one recursion iteration."""
            if guided_mode:
                pred = arrays.guidance_needed[i] if statics.skip_inert_guidance_passes else jnp.asarray(True)

                def run(lat):
                    return guided_update(lat, i, t, gate)

                def skip(lat):
                    return (lat,) + zero_guidance_outputs()

                lat2, deep, did_update, entered_refine, loss, aux, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats = jax.lax.cond(
                    pred, run, skip, latents
                )
            else:
                lat2, deep, did_update, entered_refine, loss, aux, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats = (
                    latents,
                ) + zero_guidance_outputs()
            prev, x0 = cfg_and_step(lat2, i, t, gate, deep, entered_refine, eta_key)
            # scheduler math runs fp32; the carried latent keeps the compute dtype
            return prev.astype(latents.dtype), x0, did_update, loss, aux, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats

        def step(carry, i):
            latents, key = carry
            t = sched.timesteps[i]
            gate = arrays.pww_gates[i]

            def eta_key_for(r=None):
                """Per-(step, recursion) eta-noise key, a stream disjoint from
                the renoise keys (fold_in constant 104729). None when eta==0
                so the deterministic program carries zero extra PRNG ops."""
                if statics.eta <= 0.0:
                    return None
                k = jax.random.fold_in(key, i)
                if r is not None:
                    k = jax.random.fold_in(k, r)
                return jax.random.fold_in(k, 104729)

            if recurse_steps > 1 and guided_mode:
                def recur_cond(c):
                    r, done, *_ = c
                    return jnp.logical_and(~done, r < recurse_steps)

                def recur_body(c):
                    r, done, work, out, pack = c
                    prev, x0, did_update, loss, aux, ri, nev, ebuf, emask, emaps, elats = one_pass(
                        work, i, t, gate, eta_key_for(r)
                    )
                    nev_cum = pack[5] + nev  # evals accumulate over recursions
                    done2 = jnp.logical_or(
                        jnp.logical_or(i > recurse_until, ~did_update),
                        r + 1 >= recurse_steps,
                    )
                    key_r = jax.random.fold_in(jax.random.fold_in(key, i), r)
                    work2 = renoise(sched, i, prev, key_r)
                    pack2 = (x0, did_update, loss, aux, ri, nev_cum, ebuf, emask, emaps, elats, r + 1)
                    return (r + 1, done2, work2, prev, pack2)

                x0_0 = jnp.zeros_like(latents, jnp.float32)
                pack0 = (
                    x0_0,
                    jnp.asarray(False),
                    jnp.zeros(()),
                    zero_eval_aux(),
                    jnp.int32(0),
                    jnp.int32(0),
                    jnp.zeros((R_sub, K)),
                    jnp.zeros((R_sub,), bool),
                    _zero_eval_maps(),
                    _zero_eval_lats(),
                    jnp.int32(0),
                )
                _r, _done, _work, prev, pack = jax.lax.while_loop(
                    recur_cond, recur_body, (jnp.int32(0), jnp.asarray(False), latents, latents, pack0)
                )
                x0, did_update, loss, aux, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats, recursions = pack
            else:
                prev, x0, did_update, loss, aux, refine_iters, n_evals, eval_buf, eval_mask, eval_maps, eval_lats = one_pass(
                    latents, i, t, gate, eta_key_for()
                )
                recursions = jnp.int32(1)

            if statics.diag_level == 0:
                # minimal outputs: only what cheap callers (bench, image-only
                # API use) read; the heavy tensors become unit placeholders so
                # XLA dead-code-eliminates their compute (incl. the quantile
                # sort) and the scan's stacked output stays tiny
                diag = StepDiag(
                    total_loss=loss,
                    group_unscaled=aux["gu"],
                    per_token_unscaled=jnp.zeros((1,)),
                    token_attn_sum=jnp.zeros((1,)),
                    col=jnp.zeros((1,)),
                    row=jnp.zeros((1,)),
                    max_attn=jnp.zeros((1,)),
                    refine_iters=refine_iters,
                    n_evals=n_evals,
                    did_update=did_update,
                    recursions=recursions,
                    latent_mean=jnp.zeros((1,)),
                    latent_std=jnp.zeros((1,)),
                    latent_p99=jnp.zeros((1,)),
                    x0_pred=jnp.zeros((1, 1, 1), jnp.float16),
                    latent_in=jnp.zeros((1, 1, 1), jnp.float16),
                    maps=jnp.zeros((1, 1, 1), jnp.float16),
                    eval_unscaled=jnp.zeros((1, 1)),
                    eval_mask=jnp.zeros((1,), bool),
                    eval_maps=jnp.zeros((1, 1, 1, 1), jnp.float16),
                    eval_latents=jnp.zeros((1, 1, 1, 1), jnp.float16),
                )
                return (prev.astype(latents0.dtype), key), diag
            lat_f32 = prev.astype(jnp.float32)
            absl = jnp.abs(lat_f32)
            # bulk per-step tensors travel to the host as fp16 — diagnostics
            # only, and host transfer is a measurable share of per-image
            # latency on remote-attached TPUs
            diag = StepDiag(
                total_loss=loss,
                group_unscaled=aux["gu"],
                per_token_unscaled=aux["unscaled_tok"],
                token_attn_sum=aux["attn_sum"],
                col=aux["col"],
                row=aux["row"],
                max_attn=aux["max_attn"],
                refine_iters=refine_iters,
                n_evals=n_evals,
                did_update=did_update,
                recursions=recursions,
                latent_mean=jnp.mean(lat_f32, axis=(0, 1, 2)),
                latent_std=jnp.std(absl, axis=(0, 1, 2)),
                latent_p99=jnp.quantile(absl.reshape(-1, C), 0.99, axis=0),
                x0_pred=x0[0].astype(jnp.float16),
                latent_in=latents[0].astype(jnp.float16),
                maps=aux["maps"].astype(jnp.float16),
                eval_unscaled=eval_buf,
                eval_mask=eval_mask,
                eval_maps=eval_maps,
                eval_latents=eval_lats,
            )
            return (prev.astype(latents0.dtype), key), diag

        if segment_len is None:
            xs = jnp.arange(S, dtype=jnp.int32)
        else:
            xs = jnp.asarray(start, jnp.int32) + jnp.arange(segment_len, dtype=jnp.int32)
        (final_latents, _), diags = jax.lax.scan(step, (latents0, key), xs)
        return final_latents, diags

    return generate


def build_generate(sd, statics, hp, from_where=("up", "down", "mid"), segment_len=None):
    """Jitted single-sample generate (latents donated)."""
    return jax.jit(
        build_generate_raw(sd, statics, hp, from_where, segment_len), donate_argnums=(2,)
    )

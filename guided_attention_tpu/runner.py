"""GuidedAttentionPipeline: the user-facing pipeline object.

Mirrors the reference's pipeline call surface (reference run.py:44-67,
pipeline_guided_attention.py:746-777) while keeping everything under the
hood functional: one compiled ``generate`` program per (statics,
hyperparams) pair, cached, with all per-run data passed as arrays.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from guided_attention_tpu.annotation import Annotation, parse_prompt
from guided_attention_tpu.config import HyperParams, RunConfig
from guided_attention_tpu.guidance.custom import CustomLossRegistry, default_registry
from guided_attention_tpu.guidance.spec import GuidanceSpec, build_guidance_spec
from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.pipeline import (
    GenStatics,
    StepDiag,
    build_generate,
    build_generate_raw,
    make_step_arrays,
)
from guided_attention_tpu.schedulers.ddim import make_ddim_schedule


def _mask_seed(seed) -> int:
    """Seeds up to 2^32-2 (the reference GUI range, gui.py:29) overflow an
    int32 jit argument; uint32 is bit-identical to the int path for < 2^31."""
    return int(seed) & 0xFFFFFFFF


def _seed_u32(seed) -> jnp.ndarray:
    return jnp.uint32(_mask_seed(seed))


def _derive_seed(cfg, seed):
    """seed -> (init latents, run key). The ONE definition of seed semantics
    (PRNGKey -> split -> seeded normal), shared by the fused, non-fused, and
    batch paths so they can never drift apart."""
    key_init, key_run = jax.random.split(jax.random.PRNGKey(seed))
    lat0 = jax.random.normal(
        key_init, (1, cfg.latent_size, cfg.latent_size, cfg.unet.in_channels), jnp.float32
    ).astype(cfg.unet.dtype)
    return lat0, key_run


# --- pull-time diagnostic trimming (opt-in: dispatch*(trim_heavy_diags=True))
# x0_pred and latent_in stack [S] steps of [h,w,C] f16 (~3.2 MB of the
# ~5.4 MB full-diagnostic transfer per 50-step image), but artifact writing
# at diagnostic_level 0 only ever reads steps [0, 1, 2] (the reference's
# always_save_iter, pipeline:881). The per-step maps [S,R,R,K] f16 (~2 MB)
# and eval_unscaled [S,R_sub,K] are nonzero ONLY at guidance-eval steps
# (pipeline.guidance_gates — with default thresholds {0: 1.0} that is step 0
# alone), so they gather down to those steps on device and scatter back into
# full-shape zeros on the host after the pull (content-exact: the dropped
# steps were zeros). Trimming happens ON DEVICE before the one batched
# device->host pull — on remote-attached TPUs the transfer is the dominant
# cost of the serving artifact path (docs/SERVING.md).
_TRIM_KEEP = 3


def _trim_plan(statics, hp):
    """Static eval-step indices for the maps/eval_unscaled gather, or None
    when every step could eval (skip_inert_guidance_passes off — trimming
    would drop real content)."""
    from guided_attention_tpu.pipeline import guidance_gates

    if statics.run_standard_sd:
        return ()
    if not statics.skip_inert_guidance_passes:
        return None
    _thr, _upd, needed = guidance_gates(statics, hp)
    return tuple(int(i) for i in np.where(needed)[0])


@functools.lru_cache(maxsize=64)
def _trim_fn(keep, batched: bool):
    """Jitted heavy-leaf trim for one (eval-step set, batched) signature."""
    idx = None if keep is None else jnp.asarray(keep, jnp.int32)

    def trim(x0_pred, latent_in, maps, eval_unscaled):
        if batched:
            x0, li = x0_pred[:, :_TRIM_KEEP], latent_in[:, :_TRIM_KEEP]
            if idx is not None:
                maps, eval_unscaled = maps[:, idx], eval_unscaled[:, idx]
        else:
            x0, li = x0_pred[:_TRIM_KEEP], latent_in[:_TRIM_KEEP]
            if idx is not None:
                maps, eval_unscaled = maps[idx], eval_unscaled[idx]
        return x0, li, maps, eval_unscaled

    return jax.jit(trim)


def _apply_trim(diags, batched: bool, keep=None):
    """Replace the heavy per-step leaves with their trimmed forms; no-op on
    placeholder (capture_diagnostics=False) diagnostics. ``keep`` is the
    _trim_plan result; PendingOutput/PendingBatch.result() scatters the
    gathered maps/eval_unscaled back to full shape host-side."""
    if diags.x0_pred.ndim < 3 or diags.x0_pred.shape[-2] <= 1:
        return diags  # minimal placeholders — nothing heavy to trim
    if isinstance(diags.x0_pred, np.ndarray):  # multi-process: already host
        k = _TRIM_KEEP
        sl = (slice(None), slice(0, k)) if batched else slice(0, k)
        return diags.replace(x0_pred=diags.x0_pred[sl], latent_in=diags.latent_in[sl])
    do_maps = keep is not None and diags.maps.shape[-1] > 1
    fn = _trim_fn(keep if do_maps else None, batched)
    x0, li, maps, eu = fn(diags.x0_pred, diags.latent_in, diags.maps, diags.eval_unscaled)
    if do_maps:
        return diags.replace(x0_pred=x0, latent_in=li, maps=maps, eval_unscaled=eu)
    return diags.replace(x0_pred=x0, latent_in=li)


def _scatter_trimmed(diags, keep, S: int, batched: bool):
    """Host-side inverse of the maps/eval_unscaled gather: scatter the kept
    steps back into full-[S] zeros (exact — the dropped steps were zeros by
    construction). No-op when the shapes are already full."""
    if keep is None or diags.maps.shape[-1] <= 1:
        return diags
    step_ax = 1 if batched else 0
    if diags.maps.shape[step_ax] == S:
        return diags

    def scatter(x):
        x = np.asarray(x)
        shape = x.shape[:step_ax] + (S,) + x.shape[step_ax + 1:]
        full = np.zeros(shape, x.dtype)
        if len(keep):
            if batched:
                full[:, list(keep)] = x
            else:
                full[list(keep)] = x
        return full

    return diags.replace(
        maps=scatter(diags.maps), eval_unscaled=scatter(diags.eval_unscaled)
    )


@dataclasses.dataclass
class PipelineOutput:
    images: np.ndarray  # [B, H, W, 3] float in [0, 1]
    latents: np.ndarray
    diagnostics: Any  # StepDiag with leading [S] axis (numpy)
    spec: GuidanceSpec
    prompt: str
    annotations: List[Annotation]
    # generate_resumable only: the step a prior run's persisted state
    # restarted this generation from (0 = ran from scratch)
    resumed_from_step: int = 0

    def average_maps(self) -> Optional[np.ndarray]:
        """Cross-step averaged attention maps [R, R, K] — the counterpart of
        the reference's ``AttentionStore(save_global_store=True)`` +
        ``get_average_global_attention`` (reference utils/ptp_utils.py:
        233-251). Documented deviation: the reference accumulates the raw
        per-layer store over every controller step (CFG passes included)
        and divides by the step count; here the scan's per-step diagnostics
        carry the final-eval aggregated/smoothed maps, so the average runs
        over the steps that actually evaluated guidance (n_evals > 0).
        Returns None when no step produced maps (run_standard_sd, or
        capture_diagnostics=False)."""
        d = self.diagnostics
        maps = np.asarray(d.maps, np.float32)
        if maps.ndim != 4 or maps.shape[1] < 2:  # diag_level 0 placeholder
            return None
        mask = np.asarray(d.n_evals) > 0
        if not mask.any():
            return None
        return maps[mask].mean(axis=0)


@dataclasses.dataclass
class PendingOutput:
    """An issued-but-not-pulled generation (JAX arrays are futures).

    Holds the on-device results of one dispatched generate call;
    ``result()`` performs the single batched device->host transfer and
    materializes the PipelineOutput. Lets seed sweeps overlap seed i's
    host tail with seed i+1's device compute (GuidedAttentionPipeline.dispatch).
    """

    _img_u8: Any
    _latents: Any
    _diags: Any
    _decode: bool
    spec: GuidanceSpec
    prompt: str
    annotations: List[Annotation]
    # maps/eval_unscaled gather bookkeeping (trim_heavy_diags): the kept
    # eval-step indices + full step count, for the host-side scatter-back
    _trim_keep: Optional[Tuple[int, ...]] = None
    _trim_S: int = 0

    def result(self) -> PipelineOutput:
        # ONE batched device->host pull: per-leaf np.asarray costs a tunnel
        # roundtrip per StepDiag field (~0.6 s/image on remote TPUs)
        img_u8, final_np, diags_np = jax.device_get((self._img_u8, self._latents, self._diags))
        if self._trim_keep is not None:
            diags_np = _scatter_trimmed(diags_np, self._trim_keep, self._trim_S, batched=False)
        images = None
        if self._decode:
            images = np.asarray(img_u8).astype(np.float32) / 255.0
        return PipelineOutput(
            images=images,
            latents=final_np,
            diagnostics=diags_np,
            spec=self.spec,
            prompt=self.prompt,
            annotations=self.annotations,
        )


def _hp_key(hp: HyperParams):
    return tuple(
        tuple(sorted(v.items())) if isinstance(v, dict) else v
        for v in dataclasses.asdict(hp).values()
    )


# PrepareOptions fields that need bespoke handling in cache_key (everything
# else is hashable as-is and keyed generically from the field list)
_UNHASHABLE_OPTS = ("annotations", "hp", "thresholds", "scale_range")


def _freeze_annotations(annotations):
    """Value-based hashable form of caller-supplied annotations, or None when
    any entry defies normalization (unknown target type -> uncacheable).

    Keying by VALUE (not identity) makes the prepare cache correct even for
    exotic callers: Annotation/Rect are frozen dataclasses
    (annotation.py:32-69), and a hypothetical mutable target (a caller
    passing a list as COOR payload) is snapshotted into a tuple here — a
    later call after mutation produces a different key and re-prepares."""
    out = []
    for a in annotations:
        t = getattr(a, "target", None)
        if t is None:
            tk = None
        elif isinstance(t, (tuple, list)):
            tk = tuple(float(v) for v in t)
        elif hasattr(t, "x"):  # Rect
            tk = (float(t.x), float(t.y), float(t.width), float(t.height), float(t.size))
        else:
            return None
        try:
            out.append((str(a.subprompt), int(a.kind), tk))
        except (TypeError, ValueError, AttributeError):
            return None
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class PrepareOptions:
    """Every knob that shapes one prepared generation (the parsed spec,
    GenStatics, schedule, step arrays, and prompt embedding).

    Single source of truth: defaults live here, the public
    ``dispatch``/``generate_batch`` signatures mirror them (reference
    keyword surface, pipeline_guided_attention.py:746-806), and
    ``cache_key`` derives the prepare-cache identity from the field list
    itself — a new knob cannot be forgotten in the key."""

    meta_prompt: Optional[str] = None
    prompt: Optional[str] = None
    annotations: Optional[List[Annotation]] = None
    hp: Optional[HyperParams] = None
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    max_iter_to_alter: int = 25
    attention_res: int = 16
    run_standard_sd: bool = False
    thresholds: Optional[Dict[int, float]] = None
    scale_factor: float = 20.0
    scale_range: Tuple[float, float] = (1.0, 0.5)
    smooth_attentions: bool = True
    sigma: float = 0.5
    kernel_size: int = 3
    sd_2_1: bool = False
    only_update_on_threshold_steps: bool = True
    sub_prompt_avg_within: bool = False
    skip_inert_guidance_passes: bool = True
    diagnostic_level: int = 0
    negative_prompt: str = ""
    capture_eval_maps: bool = False
    capture_diagnostics: bool = True
    eta: float = 0.0
    capture_eval_latents: bool = False
    remat_guidance_eval: bool = False

    @classmethod
    def from_locals(cls, ns: Dict[str, Any]) -> "PrepareOptions":
        """Build from a public method's ``locals()``: every field must exist
        as a same-named parameter there (a KeyError here means the public
        signature and this dataclass drifted apart — loud, at call time)."""
        return cls(**{f.name: ns[f.name] for f in dataclasses.fields(cls)})

    def cache_key(self, registry_version: int):
        """Hashable identity for the prepare cache, or None when uncacheable
        (an annotation target of an unrecognized type). Caller-supplied
        annotations key by VALUE (_freeze_annotations) — the API path
        (``annotations=[...]``) hits the prepare cache like meta-prompt
        strings do, and mutated-then-reused objects still re-prepare because
        their value key changes."""
        ann_key = None
        if self.annotations is not None:
            ann_key = _freeze_annotations(self.annotations)
            if ann_key is None:
                return None
        scalars = tuple(
            getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name not in _UNHASHABLE_OPTS
        )
        return (
            registry_version,
            scalars,
            ann_key,
            _hp_key(self.hp) if self.hp is not None else None,
            tuple(sorted(self.thresholds.items())) if self.thresholds is not None else None,
            tuple(self.scale_range),
        )


@dataclasses.dataclass
class PendingBatch:
    """An issued-but-not-pulled batch generation (see PendingOutput).

    Single-process, the fields hold device arrays — the guided scan AND the
    sharded VAE decode are already on the device queue — and ``result()``
    performs one batched device->host pull. Multi-process, the gather
    collectives already ran in ``dispatch_batch`` (they must execute in
    lockstep on every host) and the fields hold host numpy."""

    _img_u8: Any  # [B, H, W, 3] uint8 (device or host) or None
    _final: Any  # [B, 1, h, w, C]
    _diags: Any
    _materialized: bool
    per_out: List[Any]  # per-sample (prompt, annotations, spec)
    seeds: List[int]
    _trim_keep: Optional[Tuple[int, ...]] = None  # see PendingOutput
    _trim_S: int = 0

    def result(self) -> List[PipelineOutput]:
        if self._materialized:
            img_u8, final, diags = self._img_u8, self._final, self._diags
        else:
            img_u8, final, diags = jax.device_get((self._img_u8, self._final, self._diags))
        if self._trim_keep is not None:
            diags = _scatter_trimmed(diags, self._trim_keep, self._trim_S, batched=True)
        batch_images = None
        if img_u8 is not None:
            batch_images = np.asarray(img_u8).astype(np.float32) / 255.0
        outputs = []
        for b, _seed in enumerate(self.seeds):
            images = None
            if batch_images is not None:
                # copy: a view would alias every output to one batch buffer
                # (in-place annotation of one image would corrupt the rest)
                images = batch_images[b : b + 1].copy()
            b_prompt, b_anns, b_spec = self.per_out[b]
            outputs.append(
                PipelineOutput(
                    images=images,
                    latents=final[b],
                    diagnostics=jax.tree_util.tree_map(lambda x: x[b], diags),
                    spec=b_spec,
                    prompt=b_prompt,
                    annotations=b_anns,
                )
            )
        return outputs


class GuidedAttentionPipeline:
    """prompt + annotations -> guided image, all compute in one XLA program."""

    def __init__(self, sd: StableDiffusion, registry: Optional[CustomLossRegistry] = None):
        self.sd = sd
        self.registry = registry or default_registry()
        self._generate_cache: Dict[Any, Any] = {}
        self._fused_cache: Dict[Any, Any] = {}
        self._batch_cache: Dict[Any, Any] = {}
        self._prepare_cache: Dict[Any, Any] = {}
        self._stack_cache: Dict[Any, Any] = {}  # stacked multi-prompt (spec, emb)
        self._registry_version = 0
        self._encode = jax.jit(
            lambda p, ids: self.sd.text_encoder.apply({"params": p}, ids)
        )
        cfg = sd.config
        # eager random.normal / PRNGKey / split each cost a host<->device
        # roundtrip on remote-attached TPUs; jit them like everything else.
        # Single-sample and batch init share _derive_seed verbatim.
        derive = lambda seed: _derive_seed(cfg, seed)  # noqa: E731
        self._derive_jit = jax.jit(derive)
        self._batch_init_jit = jax.jit(jax.vmap(derive))

    def register_custom_loss(self, name: str, loss) -> None:
        """(reference run.py:229-232)"""
        self.registry.register(name, loss)
        # prepared specs bake in the registry contents; invalidate
        self._registry_version += 1

    # ------------------------------------------------------------------
    def encode_prompt(self, prompt: str, negative_prompt: str = "") -> jnp.ndarray:
        from guided_attention_tpu.models.tokenizer import pad_ids

        ids = jnp.asarray(
            [pad_ids(self.sd.tokenizer, negative_prompt), pad_ids(self.sd.tokenizer, prompt)],
            jnp.int32,
        )
        return self._encode(self.sd.params["text_encoder"], ids)

    _hp_key = staticmethod(_hp_key)

    def _get_generate(self, statics: GenStatics, hp: HyperParams):
        key = (statics, self._hp_key(hp))
        if key not in self._generate_cache:
            self._generate_cache[key] = build_generate(self.sd, statics, hp)
        return self._generate_cache[key]

    def _get_fused(self, statics: GenStatics, hp: HyperParams):
        """seed -> (u8 image, final latents, diags) as ONE compiled program:
        PRNG derivation, latent init, the guided scan, VAE decode, and uint8
        quantization fused so the common generate-an-image call costs a single
        dispatch (each separate jit call adds ~60 ms over a remote-attached
        TPU tunnel)."""
        key = (statics, self._hp_key(hp))
        if key not in self._fused_cache:
            raw = build_generate_raw(self.sd, statics, hp)
            sd = self.sd
            cfg = sd.config

            def fused(params, emb, seed, spec, sched, arrays):
                lat0, key_run = _derive_seed(cfg, seed)
                final, diags = raw(params, emb, lat0, spec, sched, arrays, key_run)
                img = sd._decode_u8_fn(params["vae"], final)
                return img, final, diags

            self._fused_cache[key] = jax.jit(fused)
        return self._fused_cache[key]

    # ------------------------------------------------------------------
    def _prepare(self, opts: PrepareOptions):
        # Seed sweeps re-call with identical prompt/config: cache the prepared
        # (spec, statics, sched, arrays, emb) so repeat calls skip the host->
        # device uploads + CLIP forward (~100 ms/image on a remote tunnel).
        cache_key = opts.cache_key(self._registry_version)
        if cache_key is not None:
            hit = self._prepare_cache.get(cache_key)
            if hit is not None:
                return hit
        prepared = self._prepare_uncached(opts)
        if cache_key is not None:
            if len(self._prepare_cache) >= 64:  # bound device-array residency
                self._prepare_cache.pop(next(iter(self._prepare_cache)))
            self._prepare_cache[cache_key] = prepared
        return prepared

    def _prepare_uncached(self, o: PrepareOptions):
        # Reject degenerate knobs with actionable ValueErrors (HTTP 400 in
        # the serving frontends) instead of their obscure downstream
        # failures: steps=0 hit a ZeroDivisionError deep in the schedule (a
        # 500-class fault), sigma=0 built a silent all-NaN smoothing kernel
        # that poisoned the whole run (finite=False outputs), and an
        # off-grid attention_res died with "need at least one array to
        # concatenate" at trace time.
        if not 1 <= o.num_inference_steps <= 10_000:
            # upper bound matters for serving: schedule/diagnostic arrays are
            # allocated proportional to steps at prepare time, under the
            # pipeline lock — an unbounded value is a one-request DoS
            raise ValueError(
                f"num_inference_steps must be in [1, 10000], got {o.num_inference_steps}"
            )
        if not o.run_standard_sd and o.smooth_attentions and not o.sigma > 0:
            # standard SD never builds the smoothing kernel — don't reject a
            # sweep's control arm over a knob it doesn't use
            raise ValueError(
                f"sigma must be > 0 (got {o.sigma}); pass "
                "smooth_attentions=False to disable smoothing"
            )
        if not 1 <= o.kernel_size <= 99:
            raise ValueError(f"kernel_size must be in [1, 99], got {o.kernel_size}")
        for name in ("guidance_scale", "scale_factor", "sigma", "eta"):
            if not math.isfinite(getattr(o, name)):
                raise ValueError(f"{name} must be finite, got {getattr(o, name)}")
        if not all(math.isfinite(v) for v in o.scale_range):
            raise ValueError(f"scale_range must be finite, got {o.scale_range}")
        sample = getattr(self.sd.config, "latent_size", 64)
        if (
            o.attention_res < 1
            or o.attention_res > sample
            or sample % o.attention_res
            or o.attention_res & (o.attention_res - 1)
        ):
            raise ValueError(
                f"attention_res must be a power-of-two divisor of the UNet "
                f"latent resolution ({sample}), got {o.attention_res}"
            )

        hp = o.hp or HyperParams()
        if o.thresholds is not None:
            hp = hp.replace(thresholds=o.thresholds)
        if len(hp.thresholds) == 0:  # pipeline:916-917
            hp = hp.replace(thresholds={0: float("inf")})

        prompt, annotations = o.prompt, o.annotations
        custom_losses: Dict[str, Any] = {}
        if o.meta_prompt is not None:
            prompt, annotations, custom_losses = parse_prompt(o.meta_prompt, self.registry.as_dict())
        assert prompt is not None
        annotations = annotations or []

        spec = build_guidance_spec(
            self.sd.tokenizer,
            prompt,
            annotations,
            hp,
            custom_losses,
            attention_res=o.attention_res,
            normalize_eot=o.sd_2_1,
        )

        thr_values = list(hp.thresholds.values())
        statics = GenStatics(
            num_steps=o.num_inference_steps,
            guidance_scale=o.guidance_scale,
            attention_res=o.attention_res,
            smooth_attentions=o.smooth_attentions,
            sigma=o.sigma,
            kernel_size=o.kernel_size,
            run_standard_sd=o.run_standard_sd,
            skip_inert_guidance_passes=o.skip_inert_guidance_passes,
            sub_prompt_avg_within=o.sub_prompt_avg_within,
            only_update_on_threshold_steps=o.only_update_on_threshold_steps,
            max_iter_to_alter=o.max_iter_to_alter,
            last_threshold=float(thr_values[-1]) if thr_values else float("inf"),
            capture_eval_maps=o.capture_eval_maps and o.capture_diagnostics,
            capture_eval_latents=o.capture_eval_latents and o.capture_diagnostics,
            capture_step_maps=o.capture_diagnostics,
            diag_level=1 if o.capture_diagnostics else 0,
            eta=float(o.eta),
            remat_guidance_eval=o.remat_guidance_eval,
        )

        sched = make_ddim_schedule(o.num_inference_steps)
        arrays = make_step_arrays(statics, hp, sched, o.scale_factor, o.scale_range)
        emb = self.encode_prompt(prompt, o.negative_prompt)
        return hp, prompt, annotations, spec, statics, sched, arrays, emb

    def dispatch(
        self,
        meta_prompt: Optional[str] = None,
        prompt: Optional[str] = None,
        annotations: Optional[List[Annotation]] = None,
        hp: Optional[HyperParams] = None,
        seed: int = 42,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        max_iter_to_alter: int = 25,
        attention_res: int = 16,
        run_standard_sd: bool = False,
        thresholds: Optional[Dict[int, float]] = None,
        scale_factor: float = 20.0,
        scale_range: Tuple[float, float] = (1.0, 0.5),
        smooth_attentions: bool = True,
        sigma: float = 0.5,
        kernel_size: int = 3,
        sd_2_1: bool = False,
        only_update_on_threshold_steps: bool = True,
        sub_prompt_avg_within: bool = False,
        skip_inert_guidance_passes: bool = True,
        diagnostic_level: int = 0,
        negative_prompt: str = "",
        latents: Optional[jnp.ndarray] = None,
        decode: bool = True,
        capture_eval_maps: bool = False,
        capture_diagnostics: bool = True,
        eta: float = 0.0,
        capture_eval_latents: bool = False,
        remat_guidance_eval: bool = False,
        trim_heavy_diags: bool = False,
    ) -> "PendingOutput":
        """Issue one generation WITHOUT pulling results: returns a
        PendingOutput whose ``.result()`` does the (blocking) device->host
        transfer. JAX dispatch is async, so issuing seed i+1's call before
        pulling seed i's results overlaps the host tail (jit dispatch +
        transfer, ~0.1-0.2 s/image on remote-attached TPUs) with device
        compute — frontends' seed sweeps pipeline with depth 2
        (frontends/cli.execute)."""
        # the signature mirrors PrepareOptions (plus per-call seed/latents/
        # decode); from_locals fails loudly if the two ever drift apart
        opts = PrepareOptions.from_locals(locals())
        hp, prompt, annotations, spec, statics, sched, arrays, emb = self._prepare(opts)

        if decode and latents is None:
            # common path (CLI/GUI/bench): everything from PRNG derivation to
            # uint8 image in one dispatch
            fused = self._get_fused(statics, hp)
            img_u8, final_latents, diags = fused(
                self.sd.params, emb, _seed_u32(seed), spec, sched, arrays
            )
        else:
            lat0, key_run = self._derive_jit(_seed_u32(seed))
            if latents is None:
                latents = lat0
            else:
                # generate() donates its latents argument; never invalidate a
                # user-supplied buffer
                latents = jnp.array(latents, copy=True)

            generate = self._get_generate(statics, hp)
            final_latents, diags = generate(
                self.sd.params, emb, latents, spec, sched, arrays, key_run
            )
            img_u8 = self.sd.decode_latents_u8(final_latents) if decode else None
        keep = None
        if trim_heavy_diags:
            keep = _trim_plan(statics, hp)
            diags = _apply_trim(diags, batched=False, keep=keep)
        return PendingOutput(
            _img_u8=img_u8,
            _latents=final_latents,
            _diags=diags,
            _decode=decode,
            spec=spec,
            prompt=prompt,
            annotations=annotations,
            _trim_keep=keep if trim_heavy_diags else None,
            _trim_S=statics.num_steps,
        )

    def __call__(self, *args, **kwargs) -> PipelineOutput:
        return self.dispatch(*args, **kwargs).result()

    @staticmethod
    def _stack_specs(specs: List[GuidanceSpec]) -> GuidanceSpec:
        """Stack per-prompt specs along a new leading batch axis.

        Multi-prompt constraint (documented at generate_batch): all prompts
        must share the spec's STATIC structure — same number of sub-prompt
        groups and identical (bound) custom losses — because those fields are
        baked into the single traced program the batch shares. Array leaves
        (token bindings, geometry, masks) are free to differ per prompt.
        """
        s0 = specs[0]
        for k, s in enumerate(specs[1:], 1):
            if s.n_groups != s0.n_groups or s.custom_group != s0.custom_group:
                raise ValueError(
                    "multi-prompt batch requires every prompt to produce the same "
                    "sub-prompt group structure (prompt 0: "
                    f"{s0.n_groups} groups, custom-loss group {s0.custom_group}; "
                    f"prompt {k}: {s.n_groups} groups, custom-loss group "
                    f"{s.custom_group}; -1 = no custom loss)"
                )
            if s.custom_losses != s0.custom_losses:
                raise ValueError(
                    "multi-prompt batch requires identical custom-loss bindings "
                    "across prompts (custom losses bake token indices into the "
                    "traced program as static state)"
                )
        # normalize host-side metadata so the flax-struct treedefs match;
        # per-output metadata is re-attached from the per-prompt prepares
        norm = [
            s.replace(words=s0.words, subprompts=s0.subprompts, custom_losses=s0.custom_losses)
            for s in specs
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *norm)

    def _prepare_batch(self, opts: PrepareOptions, seeds: List[int], meta_prompts):
        """Shared batch prepare: single- or multi-prompt specs/embeddings,
        stacked + cached (see dispatch_batch for the semantics)."""
        per_prompt = meta_prompts is not None
        if per_prompt:
            if opts.meta_prompt is not None or opts.prompt is not None or opts.annotations is not None:
                raise TypeError("pass either meta_prompts (one per seed) or a single meta_prompt/prompt")
            if len(meta_prompts) != len(seeds):
                raise ValueError(
                    f"meta_prompts has {len(meta_prompts)} entries for {len(seeds)} seeds"
                )
            prepared = [
                self._prepare(dataclasses.replace(opts, meta_prompt=mp)) for mp in meta_prompts
            ]
            hp, _, _, _, statics, sched, arrays, _ = prepared[0]
            # cache the stacked spec/emb per prompt-set: the ~10 eager
            # jnp.stack dispatches cost a tunnel roundtrip each (~0.2-0.4 s)
            # on remote TPUs — repeated prompt sets (server traffic, chunked
            # sweeps) should pay them once
            ck = opts.cache_key(self._registry_version)
            stack_key = (tuple(meta_prompts), ck) if ck is not None else None
            hit = self._stack_cache.get(stack_key) if stack_key is not None else None
            if hit is not None:
                spec, emb = hit
            else:
                spec = self._stack_specs([p[3] for p in prepared])
                emb = jnp.stack([p[7] for p in prepared])
                if stack_key is not None:
                    if len(self._stack_cache) >= 16:  # bound device residency
                        self._stack_cache.pop(next(iter(self._stack_cache)))
                    self._stack_cache[stack_key] = (spec, emb)
            per_out = [(p[1], p[2], p[3]) for p in prepared]  # (prompt, anns, spec)
        else:
            hp, prompt, annotations, spec, statics, sched, arrays, emb = self._prepare(opts)
            per_out = [(prompt, annotations, spec)] * len(seeds)
        return per_prompt, hp, spec, statics, sched, arrays, emb, per_out

    def dispatch_batch(
        self,
        seeds: List[int],
        meta_prompt: Optional[str] = None,
        meta_prompts: Optional[List[str]] = None,
        mesh=None,
        decode: bool = True,
        prompt: Optional[str] = None,
        annotations: Optional[List[Annotation]] = None,
        hp: Optional[HyperParams] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        max_iter_to_alter: int = 25,
        attention_res: int = 16,
        run_standard_sd: bool = False,
        thresholds: Optional[Dict[int, float]] = None,
        scale_factor: float = 20.0,
        scale_range: Tuple[float, float] = (1.0, 0.5),
        smooth_attentions: bool = True,
        sigma: float = 0.5,
        kernel_size: int = 3,
        sd_2_1: bool = False,
        only_update_on_threshold_steps: bool = True,
        sub_prompt_avg_within: bool = False,
        skip_inert_guidance_passes: bool = True,
        diagnostic_level: int = 0,
        negative_prompt: str = "",
        capture_eval_maps: bool = False,
        capture_diagnostics: bool = True,
        eta: float = 0.0,
        capture_eval_latents: bool = False,
        remat_guidance_eval: bool = False,
        trim_heavy_diags: bool = False,
    ) -> "PendingBatch":
        """Issue one batch generation WITHOUT pulling results: one sharded
        program over the mesh for the guided scan, plus (single-process) the
        sharded VAE decode — ``PendingBatch.result()`` does the one blocking
        device->host pull. Frontends pipeline consecutive chunks at depth 2,
        overlapping chunk i's host tail with chunk i+1's device compute
        (same pattern as ``dispatch``). See ``generate_batch`` for the
        blocking convenience wrapper.

        (The reference loops seeds serially on one GPU, run.py:97-98;
        BASELINE config 5: '8 seeds/batch multi-prompt generation'.)

        ``meta_prompts`` (one per seed) enables multi-prompt batching: each
        sample gets its own parsed prompt/annotations/embedding while sharing
        the one compiled program. Constraint: every prompt must produce the
        same number of sub-prompt groups and identical custom-loss bindings
        (see _stack_specs). With ``meta_prompt`` (singular), all seeds share
        one prompt.

        The batch axis shards over the mesh's "data" axis; UNet params
        follow the TP rules when the mesh has a "tensor" axis.

        Multi-process: only the primary host decodes (images is None on
        processes 1..N-1 — artifact writing is host 0's job; an every-host
        decode of the allgathered batch is duplicated work). Latents and
        diagnostics are full on every host. Multi-prompt note: the first
        call encodes each distinct prompt with its own CLIP dispatch
        (~60 ms each over a remote tunnel); repeats hit the _prepare cache.

        Note: results are deterministic per path but not bitwise identical
        to the single-sample path — vmap/TP change op fusion order, and
        guided trajectories amplify those float-level differences through
        the threshold branches. Standard-SD outputs agree to ~1e-5.
        """
        from guided_attention_tpu.parallel.batch import build_batch_generate
        from guided_attention_tpu.parallel.mesh import make_mesh
        from guided_attention_tpu.parallel.multihost import is_primary, to_host

        # the signature mirrors PrepareOptions (plus per-call seeds/
        # meta_prompts/mesh/decode); from_locals fails loudly on drift
        opts = PrepareOptions.from_locals(locals())
        per_prompt, hp, spec, statics, sched, arrays, emb, per_out = self._prepare_batch(
            opts, seeds, meta_prompts
        )

        if mesh is None:
            mesh = self._default_batch_mesh(len(seeds))
        # one compiled call instead of eager PRNGKey/split/normal per seed
        # (each eager op costs a tunnel roundtrip on remote-attached TPUs)
        latents0, run_keys = self._batch_init_jit(
            jnp.asarray([_mask_seed(s) for s in seeds], jnp.uint32)
        )

        hp_key = self._hp_key(hp)
        cache_key = (statics, hp_key, tuple(mesh.shape.items()), per_prompt)
        if cache_key not in self._batch_cache:
            self._batch_cache[cache_key] = build_batch_generate(
                self.sd, statics, hp, mesh,
                per_prompt_emb=per_prompt, per_prompt_spec=per_prompt,
            )
        gen = self._batch_cache[cache_key]

        with mesh:
            final, diags = gen(self.sd.params, emb, latents0, spec, sched, arrays, run_keys)
            keep = None
            if trim_heavy_diags:
                keep = _trim_plan(statics, hp)
                diags = _apply_trim(diags, batched=True, keep=keep)
            if jax.process_count() == 1:
                img_u8 = None
                if decode:
                    # decode the STILL-SHARDED latents inside the mesh: each
                    # device decodes its own batch shard as one more queued
                    # dispatch — no host pull of latents, no re-upload (the
                    # old path cost device_get + upload + decode + device_get)
                    B = final.shape[0]
                    flat = final.reshape((B,) + final.shape[2:])
                    img_u8 = self.sd.decode_latents_u8(flat)
                return PendingBatch(
                    _img_u8=img_u8, _final=final, _diags=diags,
                    _materialized=False, per_out=per_out, seeds=list(seeds),
                    _trim_keep=keep if trim_heavy_diags else None,
                    _trim_S=statics.num_steps,
                )
            final, diags = to_host((final, diags))

        # Multi-process: the allgather collectives above must run in lockstep
        # on every host, so the pull happens here, not in result(). Only the
        # primary host decodes — artifact writing is host 0's job, and an
        # every-host decode of the full allgathered batch is duplicated work
        # that grows with host count.
        img_u8 = None
        if decode and is_primary():
            B = final.shape[0]
            flat = jnp.asarray(final.reshape((B,) + final.shape[2:]))
            img_u8 = np.asarray(jax.device_get(self.sd.decode_latents_u8(flat)))
        return PendingBatch(
            _img_u8=img_u8, _final=final, _diags=diags,
            _materialized=True, per_out=per_out, seeds=list(seeds),
            _trim_keep=keep if trim_heavy_diags else None,
            _trim_S=statics.num_steps,
        )

    @staticmethod
    def _default_batch_mesh(n: int):
        """Size the data axis to the largest device count dividing the batch."""
        from guided_attention_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        data = max(d for d in range(1, min(n_dev, n) + 1) if n % d == 0)
        return make_mesh({"data": data})

    def generate_batch(self, seeds: List[int], **kwargs) -> List[PipelineOutput]:
        """Generate one image per seed as ONE sharded program over the mesh:
        ``dispatch_batch(...).result()`` (same keyword surface)."""
        return self.dispatch_batch(seeds, **kwargs).result()

    def generate_batch_resumable(
        self,
        seeds: List[int],
        checkpoint_every: int = 10,
        state_dir: str = "outputs/state",
        resume: bool = True,
        decode: bool = True,
        keep_state: bool = False,
        on_segment=None,
        meta_prompts: Optional[List[str]] = None,
        mesh=None,
        **kwargs,
    ) -> List[PipelineOutput]:
        """``generate_batch`` with mid-run checkpointing: the whole sharded
        batch scans in segments of ``checkpoint_every`` steps, persisting
        (step, batch latents, diagnostics) after each — a preempted sweep
        re-invoked with the same seeds/prompts/config resumes exactly
        (see ``generate_resumable``). kwargs feed PrepareOptions (use
        ``meta_prompt=`` for a shared prompt, ``meta_prompts=`` per-seed).

        Multi-process: every host runs this same call in lockstep; after
        each segment the results allgather (multihost.to_host) so EVERY
        host persists the whole-batch state (identical bytes; atomic
        per-process tmp files make shared state dirs safe), and resume
        re-slices each host's portion via the batch engine's host-local
        glue (parallel/batch._to_global). Decode is primary-only, matching
        ``generate_batch``."""
        from guided_attention_tpu.parallel.batch import build_batch_generate
        from guided_attention_tpu.parallel.multihost import is_primary
        from guided_attention_tpu.runtime import checkpoint as ckpt

        opts = PrepareOptions(**kwargs)
        per_prompt, hp, spec, statics, sched, arrays, emb, per_out = self._prepare_batch(
            opts, seeds, meta_prompts
        )
        S = statics.num_steps
        if mesh is None:
            mesh = self._default_batch_mesh(len(seeds))
        identity = ckpt.run_identity(
            repr(opts),
            f"seeds={[_mask_seed(s) for s in seeds]}",
            f"prompts={meta_prompts}",
            f"model={self.sd.config.name}",
        )

        hp_key = self._hp_key(hp)

        def make_gen(length: int):
            cache_key = (
                statics, hp_key, tuple(mesh.shape.items()), per_prompt,
                ("segment", length),
            )
            if cache_key not in self._batch_cache:
                self._batch_cache[cache_key] = build_batch_generate(
                    self.sd, statics, hp, mesh,
                    per_prompt_emb=per_prompt, per_prompt_spec=per_prompt,
                    segment_len=length,
                )
            return self._batch_cache[cache_key]

        def init(lat_np):
            latents0, run_keys = self._batch_init_jit(
                jnp.asarray([_mask_seed(s) for s in seeds], jnp.uint32)
            )
            return (latents0 if lat_np is None else jnp.asarray(lat_np)), run_keys

        lat_np, all_diags, resumed_from = self._run_segments(
            identity=identity, state_dir=state_dir, resume=resume,
            checkpoint_every=checkpoint_every, S=S, axis=1,
            make_gen=make_gen, init=init,
            gen_args=(emb, spec, sched, arrays), on_segment=on_segment,
            mesh=mesh,
        )

        batch_images = None
        if decode and is_primary():
            # every host holds the full-batch latents after the segment
            # allgather; decode locally on the primary only (multi-process
            # parity with dispatch_batch's primary-only decode)
            with mesh:
                B = len(seeds)
                flat = jnp.asarray(lat_np).reshape((B,) + lat_np.shape[2:])
                img_u8 = jax.device_get(self.sd.decode_latents_u8(flat))
            batch_images = np.asarray(img_u8).astype(np.float32) / 255.0
        if not keep_state:
            ckpt.clear_state(state_dir, identity)

        outputs = []
        for b, _seed in enumerate(seeds):
            images = batch_images[b : b + 1].copy() if batch_images is not None else None
            b_prompt, b_anns, b_spec = per_out[b]
            outputs.append(
                PipelineOutput(
                    images=images,
                    latents=lat_np[b],
                    diagnostics=jax.tree_util.tree_map(lambda x, _b=b: x[_b], all_diags),
                    spec=b_spec,
                    prompt=b_prompt,
                    annotations=b_anns,
                    resumed_from_step=resumed_from,
                )
            )
        return outputs

    # ------------------------------------------------------------------
    def _run_segments(
        self,
        *,
        identity: str,
        state_dir: str,
        resume: bool,
        checkpoint_every: int,
        S: int,
        axis: int,
        make_gen,
        init,
        gen_args: tuple,
        on_segment,
        mesh=None,
    ):
        """Shared resume scaffold for ``generate_resumable`` and
        ``generate_batch_resumable``: restore the newest persisted state,
        scan the remaining steps in segments (``make_gen(length)`` supplies
        the compiled program; ``init(lat_np)`` the starting latents + run
        keys, called only when a segment will actually run), persisting each
        segment's (latents, diags) — per-segment files keep total checkpoint
        volume linear in run length. ``axis`` is the diagnostics step axis
        (0 single-sample, 1 batched). Returns
        (final latents np, full-run diags, resumed_from_step)."""
        import contextlib

        from guided_attention_tpu.parallel.multihost import to_host
        from guided_attention_tpu.runtime import checkpoint as ckpt

        multi = jax.process_count() > 1
        lat_np, start, all_diags = None, 0, None
        if resume:
            st = ckpt.latest_state(state_dir, identity, axis=axis)
            if st is not None:
                start, lat_np, all_diags = st
        resumed_from = start
        if start >= S:  # persisted state already covers the full run
            return lat_np, all_diags, resumed_from

        emb, spec, sched, arrays = gen_args
        latents, keys = init(lat_np)
        with mesh if mesh is not None else contextlib.nullcontext():
            for a, b in ckpt.segment_bounds(start, S, checkpoint_every):
                gen = make_gen(b - a)
                latents, diags = gen(
                    self.sd.params, emb, latents, spec, sched, arrays, keys,
                    jnp.int32(a),
                )
                # one batched pull; the next segment donates the device
                # latents. Multi-process: allgather the full batch so every
                # host persists whole-batch state (and the next segment
                # re-slices this host's portion from the numpy full batch —
                # a global sharded array is not host-addressable here).
                lat_np, diag_np = to_host((latents, diags))
                if multi:
                    latents = lat_np
                ckpt.save_state(state_dir, identity, b, lat_np, diag_np, seg_start=a)
                all_diags = (
                    diag_np if all_diags is None
                    else ckpt.concat_diags([all_diags, diag_np], axis=axis)
                )
                if on_segment is not None:
                    on_segment(b, S)
        return lat_np, all_diags, resumed_from

    def _get_segment(self, statics: GenStatics, hp: HyperParams, length: int):
        """Jitted generate over ``length`` steps from a TRACED start step —
        one compiled program serves every segment of that length (a
        checkpoint_every dividing num_steps therefore costs exactly one
        extra compile; off-grid resume adds one for its shorter first
        segment)."""
        key = (statics, self._hp_key(hp), ("segment", length))
        if key not in self._generate_cache:
            self._generate_cache[key] = build_generate(
                self.sd, statics, hp, segment_len=length
            )
        return self._generate_cache[key]

    def generate_resumable(
        self,
        seed: int = 42,
        checkpoint_every: int = 10,
        state_dir: str = "outputs/state",
        resume: bool = True,
        decode: bool = True,
        keep_state: bool = False,
        on_segment=None,
        **kwargs,
    ) -> PipelineOutput:
        """Generate with mid-run checkpointing: the scan runs in segments of
        ``checkpoint_every`` steps, persisting (step, latents, diagnostics)
        to ``state_dir`` after each (runtime/checkpoint.py). A re-run with
        the same configuration+seed resumes from the newest persisted state
        and — because every per-step quantity and PRNG stream is keyed by
        the ABSOLUTE step index — reproduces the uninterrupted run exactly.
        State files are removed on successful completion unless
        ``keep_state``. ``on_segment(step_done, total_steps)`` is called
        after each persisted segment (progress reporting / test hooks).

        The reference has no resume story: a crash regenerates from scratch
        (SURVEY.md §5). Accepts the ``dispatch`` keyword surface minus
        latents (kwargs feed PrepareOptions directly).
        """
        from guided_attention_tpu.runtime import checkpoint as ckpt

        opts = PrepareOptions(**kwargs)
        hp, prompt, annotations, spec, statics, sched, arrays, emb = self._prepare(opts)
        S = statics.num_steps
        identity = ckpt.run_identity(
            repr(opts), f"seed={_mask_seed(seed)}", f"model={self.sd.config.name}"
        )

        def init(lat_np):
            latents0, key_run = self._derive_jit(_seed_u32(seed))
            return (latents0 if lat_np is None else jnp.asarray(lat_np)), key_run

        lat_np, all_diags, resumed_from = self._run_segments(
            identity=identity, state_dir=state_dir, resume=resume,
            checkpoint_every=checkpoint_every, S=S, axis=0,
            make_gen=lambda L: self._get_segment(statics, hp, L), init=init,
            gen_args=(emb, spec, sched, arrays), on_segment=on_segment,
        )

        images = None
        if decode:
            img_u8 = jax.device_get(self.sd.decode_latents_u8(jnp.asarray(lat_np)))
            images = np.asarray(img_u8).astype(np.float32) / 255.0
        if not keep_state:
            ckpt.clear_state(state_dir, identity)
        return PipelineOutput(
            images=images,
            latents=lat_np,
            diagnostics=all_diags,
            spec=spec,
            prompt=prompt,
            annotations=annotations,
            resumed_from_step=resumed_from,
        )


def pipeline_from_config(config: RunConfig, registry=None) -> GuidedAttentionPipeline:
    """Build the pipeline the way run.py's load_model does (reference
    run.py:18-29): SD1.x by default, SD2.1 with --sd_2_1, bf16 with
    --half_precision."""
    dtype = jnp.bfloat16 if config.half_precision or config.dtype == "bfloat16" else jnp.float32
    model = config.model or ("sd21" if config.sd_2_1 else "sd15")
    sd = StableDiffusion.create(model, dtype=dtype, checkpoint_dir=config.model_path)
    return GuidedAttentionPipeline(sd, registry)

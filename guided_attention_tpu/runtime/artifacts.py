"""Host-side artifact sink: logs, attention-map PNGs, x0 snapshots, overlays.

The reference writes all of this synchronously from inside the denoising
loop (reference pipeline_guided_attention.py:1096-1123, utils/helpers.py:
292-349, run.py:113-134). Here the compiled program returns stacked
per-step diagnostics (pipeline.StepDiag) and this module materializes the
same artifact tree afterwards — the hot loop never touches the host.

Output tree parity:
  outputs/{meta_prompt_clean}/{seed}{hyper}.png        final image
  outputs/{meta_prompt_clean}/{seed}{hyper}.txt        run log (schema below)
  outputs/{meta_prompt_clean}/{seed}{hyper}figure.png  latent-stats figure
  outputs/{meta_prompt_clean}/{seed}/_attnmap_{token}_...iter_{i:02d}..._subiter_{k:02d}.png
  outputs/{meta_prompt_clean}/{seed}/..._pred....png    x0 predictions
  outputs/{meta_prompt_clean}.png                       grid across seeds

Log schema (machine-parsed back by the batch_map_view viewer, reference
utils/batch_map_view.py:46-54):
  "{iter:02d}.{subiter:02d} loss for {word}: {value}"
"""
from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from guided_attention_tpu.annotation import Annotation, AnnotationType, meta_prompt_clean

COLORS = ["#0000a0", "#a00000", "#00a000", "#ecf024", "#8d24f0"]  # helpers.py:125


def get_color(i: int) -> str:
    return COLORS[i % len(COLORS)]


class RunLog:
    """In-memory line log (reference helpers.py:292-307)."""

    def __init__(self):
        self.lines: List[str] = []

    def log(self, text: str, also_print: bool = False):
        self.lines.append(text + os.linesep)
        if also_print:
            print(text)

    def clear(self):
        self.lines = []

    def save(self, filename):
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        with open(filename, "w") as fp:
            fp.writelines(self.lines)
        self.clear()


def dict_to_string(d) -> str:
    """Hyperparameter state -> filename suffix (reference helpers.py:281-290)."""
    if isinstance(d, dict):
        s = ""
        for k, v in d.items():
            if k == "meta_prompt":
                continue
            s += "_" + str(k) + "_" + dict_to_string(v)
        return s
    return str(d)


def save_viridis(map2d: np.ndarray, path: Path) -> None:
    """Normalized map -> viridis PNG (reference pipeline:1096-1103).

    Uses matplotlib's stateless image writer, not pyplot — no global figure
    manager, safe from concurrent artifact writers (the serving frontend
    runs level-0 writes in parallel, frontends/server.py)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import image as mpimage

    x = np.asarray(map2d, np.float32)
    x = x - x.min()
    mx = x.max()
    if mx > 0:
        x = x / mx
    path.parent.mkdir(parents=True, exist_ok=True)
    mpimage.imsave(path, x)


def to_pil(image01: np.ndarray):
    from PIL import Image

    arr = (np.clip(np.asarray(image01, np.float32), 0, 1) * 255).round().astype(np.uint8)
    return Image.fromarray(arr)


def annotate_image(pil_img, annotations: Sequence[Annotation], size: int = 512) -> None:
    """Draw crosshairs / boxes / labels in place (reference helpers.py:129-152)."""
    from PIL import ImageDraw, ImageFont

    draw = ImageDraw.Draw(pil_img)
    try:
        font = ImageFont.truetype("arial.ttf", 20)
    except Exception:
        font = ImageFont.load_default()
    for i, ann in enumerate(annotations):
        color = get_color(i)
        if ann.kind == AnnotationType.COOR:
            x, y = ann.target
            px, py = x * size, y * size
            ln = 15
            draw.line([(px - ln, py), (px + ln, py)], fill=color)
            draw.line([(px, py - ln), (px, py + ln)], fill=color)
            draw.text((px, py), ann.subprompt, fill=color, font=font)
        elif ann.kind == AnnotationType.BOX:
            r = ann.target
            draw.rectangle(
                [(r.x * size, r.y * size), (r.right * size, r.bottom * size)],
                outline=color,
                width=2,
            )
            draw.text((r.x * size, r.y * size), ann.subprompt, fill=color, font=font)


def image_grid(images: List) -> "object":
    """Square-ish grid of PIL images (reference vis_utils.py:63-73)."""
    from PIL import Image

    n = len(images)
    cols = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    w, h = images[0].size
    grid = Image.new("RGB", (cols * w, rows * h))
    for i, img in enumerate(images):
        grid.paste(img, ((i % cols) * w, (i // cols) * h))
    return grid


def save_latent_stats_figure(diag, path: Path) -> None:
    """means + p99 per channel over steps (reference helpers.py:335-349).

    Built with the object-oriented matplotlib API (Figure + Agg canvas),
    NOT pyplot: no global figure-manager state, so concurrent artifact
    writers never race it (frontends/server.py artifact-lock notes)."""
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    fig = Figure()
    FigureCanvasAgg(fig)
    ax = fig.add_subplot()
    C = diag.latent_mean.shape[-1]
    for c in range(C):
        ax.plot(diag.latent_mean[:, c], label=f"ch{c} mean")
        ax.plot(diag.latent_p99[:, c], label=f"ch{c} 99")
    ax.legend(loc="best")
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path)


class ArtifactWriter:
    """Materialize a PipelineOutput's diagnostics into the reference's
    artifact tree for one (seed, hyperparam-state) run."""

    def __init__(
        self,
        output_path: Path,
        meta_prompt: str,
        seed: int,
        hyper_suffix: str = "",
        interactive: bool = False,
        async_writer=None,
    ):
        self.root = Path(output_path)
        self.clean = meta_prompt_clean(meta_prompt, interactive)
        self.seed = seed
        self.hyper_suffix = hyper_suffix
        self.run_dir = self.root / self.clean
        self.step_dir = self.run_dir / str(seed)
        self.log = RunLog()
        if async_writer is None:
            from guided_attention_tpu.runtime.native import AsyncArtifactWriter

            async_writer = AsyncArtifactWriter(2)
        self.async_writer = async_writer

    def _state_name(self, step: int, subiter: int) -> str:
        # reference shared_state.get_name() tags (shared_state.py:39-51)
        return (
            f"cur_seed_{self.seed}_cur_time_step_iter_{step:02d}_"
            f"optimizeDeepLatent_False__subiter_{subiter:02d}"
        )

    def write_run_log(self, out, words: Dict[int, str]) -> None:
        """Reconstruct the reference's log lines from stacked diagnostics."""
        d = out.diagnostics
        S = d.total_loss.shape[0]
        for i in range(S):
            self.log.log(f"iteration {i}")
            n_slots = int(d.eval_mask[i].sum())
            for k in range(d.eval_mask.shape[1]):
                if not d.eval_mask[i, k]:
                    continue
                for tok, word in words.items():
                    self.log.log(
                        f"{i:02d}.{k:02d} loss for {word}: {float(d.eval_unscaled[i, k, tok])}"
                    )
            for tok, word in words.items():
                self.log.log(f"{word}: {float(d.token_attn_sum[i, tok])}")
                self.log.log(f"weighted center col: {float(d.col[i, tok])}")
                self.log.log(f"weighted center row: {float(d.row[i, tok])}")
            if d.did_update[i]:
                self.log.log(
                    f"\t Finished with loss of: {float(d.total_loss[i])} iter: {int(d.refine_iters[i])}"
                )
            self.log.log(f"Iteration {i} | Loss: {float(d.total_loss[i]):0.4f}")
        self.log.save(self.run_dir / f"{self.seed}{self.hyper_suffix}.txt")

    def write_step_maps(self, out, words: Dict[int, str], only_eval_steps: bool = True) -> None:
        """Per-token 16x16 attention-map PNGs named for batch_map_view."""
        d = out.diagnostics
        S = d.maps.shape[0]
        for i in range(S):
            if only_eval_steps and not d.eval_mask[i].any():
                continue
            subiter = max(int(d.eval_mask[i].sum()) - 1, 0)
            for tok, word in words.items():
                fname = (
                    f"_attnmap_{word}_{self.clean}{self._state_name(i, subiter)}.png"
                )
                self.async_writer.submit_map(d.maps[i, :, :, tok], self.step_dir / fname)
        self.async_writer.flush()

    def write_x0_preds(self, out, decode_fn, steps: Sequence[int]) -> None:
        """Decode + save x0 predictions for selected steps (reference
        always_save_iter=[0,1,2], pipeline:881,1036).

        All selected steps decode as ONE batched call + ONE pull: per-step
        decode calls cost a dispatch+transfer roundtrip each on
        remote-attached TPUs (~0.3-0.5 s per artifact write at 3 steps —
        measured while chasing the serving artifact-path slowdown,
        docs/SERVING.md 'Artifact IO under load')."""
        d = out.diagnostics
        import numpy as np

        steps = [i for i in steps if i < d.x0_pred.shape[0]]
        if not steps:
            return
        imgs = np.asarray(decode_fn(np.stack([d.x0_pred[i] for i in steps])))
        self.step_dir.mkdir(parents=True, exist_ok=True)
        for i, img01 in zip(steps, imgs):
            fname = (self.clean + self._state_name(i, 0) + "_pred").replace(".", "_") + ".png"
            # native thread-pool PNG encode (falls back to PIL): the 3
            # 512x512 encodes were ~0.2 s of handler-thread time per
            # serving artifact request (docs/SERVING.md round-5 measure)
            self.async_writer.submit_image(img01, self.step_dir / fname)
        self.async_writer.flush()

    def write_final_image(self, out, annotations, annotate: bool = False):
        img = to_pil(out.images[0])
        if annotate:
            annotate_image(img, annotations, size=img.size[0])
        self.run_dir.mkdir(parents=True, exist_ok=True)
        path = self.run_dir / f"{self.seed}{self.hyper_suffix}.png"
        try:
            # zlib level 1: encode speed over file size — the final-image
            # encode is serialized handler-thread CPU on the serving
            # artifact path (docs/SERVING.md round-5 decomposition)
            img.save(path, compress_level=1)
        except OSError:
            # path-too-long fallback (reference run.py:119-125)
            path = self.run_dir / f"{self.seed}.png"
            img.save(path, compress_level=1)
        return img, path


def dynamic_thresholding(
    latents: np.ndarray,
    per_channel: bool = False,
    center_means: bool = False,
    max_value: float = 2.5,
) -> np.ndarray:
    """Latent-clamp experiment the reference ships but never calls
    (reference utils/helpers.py:352-371): rescale so the 99th percentile of
    |latents| stays <= max_value, optionally per channel and mean-centered.
    NHWC numpy in -> new array out (the reference mutates NCHW in place)."""
    lat = np.array(latents, dtype=np.float32, copy=True)
    if per_channel:
        for c in range(lat.shape[-1]):
            p = np.quantile(np.abs(lat[..., c]), 0.99)
            if p > max_value:
                lat[..., c] *= max_value / p
        if center_means:
            for c in range(lat.shape[-1]):
                lat[..., c] -= lat[..., c].mean()
    else:
        p = np.quantile(np.abs(lat), 0.99)
        if p > max_value:
            lat *= max_value / p
        if center_means:
            lat -= lat.mean()
    return lat


def save_individual_ca_maps(pipe, out, step: int = 12, heads_dir: Optional[Path] = None):
    """Per-head, per-resolution cross-attention map dump for one step
    (reference pipeline_guided_attention.py:319-346, save_maps_at=12).

    Re-runs a single cond-only forward at that step's entry latents with
    per-head capture — the scan itself never pays for this.
    """
    import jax.numpy as jnp

    from guided_attention_tpu.models.unet import UNet2DCondition  # noqa: F401
    from guided_attention_tpu.runtime.native import AsyncArtifactWriter

    d = out.diagnostics
    step = min(step, d.latent_in.shape[0] - 1)
    lat = jnp.asarray(d.latent_in[step])[None]
    emb = pipe.encode_prompt(out.prompt)
    from guided_attention_tpu.schedulers.ddim import make_ddim_schedule

    sched = make_ddim_schedule(d.latent_in.shape[0])
    t = sched.timesteps[step]
    resolutions = sorted({lat.shape[1] // f for f in (1, 2, 4, 8)})
    cap = frozenset({("cross_perhead", r) for r in resolutions})
    _eps, aux = pipe.sd.unet.apply(
        {"params": pipe.sd.params["unet"]}, lat.astype(pipe.sd.config.unet.dtype), t, emb[1:2], capture=cap
    )
    writer = AsyncArtifactWriter(2)
    heads_dir = Path(heads_dir) if heads_dir else Path("individual_maps")
    agg = []
    for location in ("up", "down", "mid"):
        for map_iter, m in enumerate(aux["maps"][f"{location}_cross_perhead"], start=1):
            probs = np.asarray(m[0], np.float32)  # [H, Q, K]
            H, Q, K = probs.shape
            res = int(np.sqrt(Q))
            grids = probs.reshape(H, res, res, K)
            for h in range(H):
                m1 = grids[h, :, :, 1]
                tag = (
                    f"{location}_res_{res}_head_{h}_mapiter_{map_iter}"
                    f"_avg_{m1.mean():.3}_max_{m1.max():.3}"
                )
                writer.submit_map(m1, heads_dir / f"{tag}.png")
            writer.submit_map(
                grids.mean(0)[:, :, 1], heads_dir / f"{location}_res_{res}_avgheads_mapiter_{map_iter}.png"
            )
            if res == pipe.sd.config.unet.sample_size // 4:
                agg.append(grids.mean(0))
    if agg:
        final = np.stack(agg).mean(0)
        writer.submit_map(final[:, :, 1], heads_dir / "final.png")
    writer.flush()
    writer.close()
    return heads_dir


def save_self_attention_npy(pipe, out, step: int = -1, path=None, res: int = 16):
    """Aggregate self-attention at ``res`` for one step and save as .npy
    (reference pipeline:309-317 save_numpy('self_attn')); the output feeds
    viewers/self_attn_clusters.
    """
    import jax.numpy as jnp

    from guided_attention_tpu.schedulers.ddim import make_ddim_schedule

    d = out.diagnostics
    S = d.latent_in.shape[0]
    step = step % S
    lat = jnp.asarray(d.latent_in[step])[None]
    emb = pipe.encode_prompt(out.prompt)
    sched = make_ddim_schedule(S)
    t = sched.timesteps[step]
    cap = frozenset({("self", res)})
    _eps, aux = pipe.sd.unet.apply(
        {"params": pipe.sd.params["unet"]}, lat.astype(pipe.sd.config.unet.dtype), t, emb[1:2], capture=cap
    )
    items = []
    for location in ("up", "down", "mid"):
        items.extend(aux["maps"][f"{location}_self"])
    agg = np.stack([np.asarray(m[0], np.float32) for m in items]).mean(0)  # [Q, Q]
    path = Path(path) if path else Path(f"self_attn_step{step}.npy")
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, agg.reshape(res, res, res * res))
    return path


def save_diagnostic_preds(pipe, out, writer: "ArtifactWriter", diagnostic_level: int = 1):
    """Diagnostic-level image snapshots (reference pipeline:937-957,
    1034-1037, 517-535): 'pred_pre_optim' x0 estimates for every step that
    evaluated guidance (diag >= 1) and 'xt' latent decodes (diag >= 2).

    When the run captured per-refinement-slot latents
    (``capture_eval_latents``), one pred_pre_optim is decoded per (iter,
    SUBiter) from the latent that entered each refinement evaluation —
    reference parity with the in-loop per-subiteration saves at
    pipeline:517-535 (the reference burns a fresh uncond+cond UNet pass per
    subiter for these; here they are recomputed post-hoc, outside the
    compiled hot loop). Without the capture flag, one snapshot per step is
    decoded from the step-entry latents (StepDiag.latent_in)."""
    import jax.numpy as jnp

    from guided_attention_tpu.schedulers.ddim import ddim_step, make_ddim_schedule

    if diagnostic_level < 1:
        return
    d = out.diagnostics
    S = d.latent_in.shape[0]
    sched = make_ddim_schedule(S)
    emb = pipe.encode_prompt(out.prompt)
    dtype = pipe.sd.config.unet.dtype
    # real per-slot latents present? (unit placeholder is [S, 1, 1, 1, 1])
    per_slot = d.eval_latents.ndim == 5 and d.eval_latents.shape[-1] > 1

    # ONE jitted program for the CFG forward + x0 + decode: per-slot eager
    # UNet applies would cost thousands of op-by-op tunnel dispatches each on
    # remote-attached TPUs (CLAUDE.md: jit everything); with up to R_sub=12
    # slots per step this path is hot enough to matter. The wrapper is cached
    # ON THE PIPE (emb/sched enter as traced args, not closure constants) so
    # an N-seed diagnostic sweep compiles once, not once per seed.
    import jax

    x0_image = getattr(pipe, "_diag_x0_image_jit", None)
    if x0_image is None:

        def _x0_image(params, lat, i, emb, sched):
            pair = jnp.concatenate([lat, lat], axis=0)
            eps, _ = pipe.sd.unet.apply({"params": params["unet"]}, pair, sched.timesteps[i], emb)
            eps_u, eps_c = eps[0:1], eps[1:2]
            noise = eps_u + 7.5 * (eps_c - eps_u)  # reference hardcodes 7.5 (pipeline:533)
            _prev, x0 = ddim_step(sched, i, noise.astype(jnp.float32), lat.astype(jnp.float32))
            return pipe.sd._decode_fn(params["vae"], x0.astype(dtype))

        x0_image = jax.jit(_x0_image)
        pipe._diag_x0_image_jit = x0_image

    def pred_pre_optim(lat, i, subiter):
        img = np.asarray(jax.device_get(x0_image(pipe.sd.params, lat, jnp.int32(i), emb, sched)))[0]
        fname = (writer.clean + writer._state_name(i, subiter) + "_pred_pre_optim").replace(".", "_") + ".png"
        writer.async_writer.submit_image(img, writer.step_dir / fname)

    for i in range(S):
        if not d.eval_mask[i].any():
            continue
        if per_slot:
            for slot in np.nonzero(d.eval_mask[i])[0]:
                lat = jnp.asarray(d.eval_latents[i, slot], jnp.float32)[None].astype(dtype)
                pred_pre_optim(lat, i, int(slot))
        else:
            pred_pre_optim(jnp.asarray(d.latent_in[i])[None].astype(dtype), i, 0)
        if diagnostic_level > 1:
            lat = jnp.asarray(d.latent_in[i])[None].astype(dtype)
            img_xt = np.asarray(pipe.sd.decode_latents(lat))[0]
            fname = (writer.clean + writer._state_name(i, 0) + "_xt").replace(".", "_") + ".png"
            writer.async_writer.submit_image(img_xt, writer.step_dir / fname)
    writer.async_writer.flush()


def write_eval_maps(writer: "ArtifactWriter", out, words: Dict[int, str]) -> None:
    """Per-(iter, subiter) map PNGs from StepDiag.eval_maps — the reference's
    per-eval dump behavior (pipeline:237-246 executes at every loss
    evaluation). Requires the run to have used capture_eval_maps=True."""
    d = out.diagnostics
    if d.eval_maps.shape[-1] <= 1:
        raise ValueError("run with capture_eval_maps=True to dump per-eval maps")
    S, R_sub = d.eval_mask.shape
    for i in range(S):
        for k in range(R_sub):
            if not d.eval_mask[i, k]:
                continue
            for tok, word in words.items():
                fname = f"_attnmap_{word}_{writer.clean}{writer._state_name(i, k)}.png"
                writer.async_writer.submit_map(
                    np.asarray(d.eval_maps[i, k, :, :, tok], np.float32),
                    writer.step_dir / fname,
                )
    writer.async_writer.flush()


def write_run_artifacts(
    pipe,
    out,
    *,
    output_path: Path,
    seed: int,
    hp,
    meta_prompt: str,
    interactive: bool = False,
    annotate: bool = False,
    save_cross_attention_maps: bool = False,
    diagnostic_level: int = 0,
    save_all_maps: bool = False,
    save_individual_ca_maps_flag: bool = False,
):
    """Write one generation's full artifact tree (the reference's per-seed
    output block, run.py:104-135): final image (+ annotation overlay),
    machine-parsed run log, per-step attention-map PNGs, x0 prediction
    snapshots, latent-stats figure, optional per-head/JET/diagnostic dumps.

    Shared by the CLI sweep loop and the serving frontend's per-request
    artifact mode. Returns (pil_image, image_path, writer)."""
    hp_state = {
        "strict": hp.strict,
        "inside_loss_scale": hp.inside_loss_scale,
        "outside_loss_scale": hp.outside_loss_scale,
        "shrink_factor": hp.shrink_factor,
        "thresholds": hp.thresholds,
        "use_optimizer": hp.use_optimizer,
        "recurse_until": hp.recurse_until,
        "recurse_steps": hp.recurse_steps,
    }
    writer = ArtifactWriter(
        output_path,
        meta_prompt,
        seed,
        dict_to_string(hp_state),
        interactive=interactive,
    )
    words = {tok: word for tok, word in out.spec.words}
    if save_all_maps:
        # dump a map PNG for every real prompt token (reference config.py:51)
        ids = pipe.sd.tokenizer.encode(out.prompt)
        words = {
            i: pipe.sd.tokenizer.decode([t]) for i, t in enumerate(ids) if 0 < i < len(ids) - 1
        }
    img, image_path = writer.write_final_image(out, out.annotations, annotate)
    writer.write_run_log(out, words)
    if save_cross_attention_maps:
        # final-step per-token JET overlays (the reference parses but never
        # reads this flag; here it feeds the relevance viewer)
        from guided_attention_tpu.viewers.vis import show_cross_attention

        show_cross_attention(
            out,
            list(out.spec.words),
            save_path=writer.run_dir / f"{seed}{writer.hyper_suffix}cross_attention.png",
        )
    if diagnostic_level > 0:
        save_latent_stats_figure(
            out.diagnostics, writer.run_dir / f"{seed}{writer.hyper_suffix}figure.png"
        )
    if save_all_maps:
        write_eval_maps(writer, out, words)
    else:
        writer.write_step_maps(out, words)
    # x0 preds at iters [0, 1, 2] are unconditional (reference pipeline:881)
    writer.write_x0_preds(out, pipe.sd.decode_latents, [0, 1, 2])
    if save_individual_ca_maps_flag:
        save_individual_ca_maps(pipe, out, step=12, heads_dir=writer.step_dir / "heads")
    if diagnostic_level > 0:
        save_diagnostic_preds(pipe, out, writer, diagnostic_level)
    return img, image_path, writer

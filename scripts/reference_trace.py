"""Reference-side parity tracer — runs in the PyTorch reference's OWN
environment (torch + diffusers==0.12.1 + transformers, CUDA), NOT in this
repo's JAX environment. It monkey-patches recording hooks into the reference
(no source edits) and writes the same npz schema as scripts/parity_trace.py,
so the two sides can be compared with ``parity_trace.py compare``.

Usage (from anywhere, with the reference checkout on disk):
  python reference_trace.py --repo /path/to/Guided-Attention \
      --model_path CompVis/stable-diffusion-v1-4 \
      --meta_prompt "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]" \
      --seed 28 --steps 10 --latents init.npy --out ref_trace.npz

Produce ``init.npy`` with the JAX side first:
  python scripts/parity_trace.py trace ... --save_latents init.npy

Hook points (all attribute patches, reference file:line for the call sites):
  * pga.aggregate_attention (pipeline_guided_attention.py:338) — stashes the
    raw aggregated [16,16,77] cross map per guidance eval. Cloned at stash
    time because _compute_max_attention_per_index mutates the slice in place
    (``attention_for_text *= 100``, pipeline:216-218).
  * GuidedAttention._compute_loss (pipeline:973, :548, :577, :1003) — emits
    one eval record per FRESH aggregation; the duplicate gate-path call at
    :1003 reuses the previous aggregation and is skipped, matching the JAX
    side's one-record-per-UNet-eval slots.
  * helpers.log_latent_stats (pipeline:1031) — exactly one call per
    (step, recursion): the end-of-recursion marker + post-step latent stats.
    Only the LAST recursion's records per step are kept, matching StepDiag.

Caveats: the reference hard-codes CUDA generators (run.py:106,
pipeline:919-921), so recurse_steps>1 requires a CUDA device; pass
--hp '{"recurse_steps": 1}' for a CPU-only sanity run of the standard-SD
path. fp32 (no --half) recommended for comparison traces.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def nchw(arr: np.ndarray) -> np.ndarray:
    if arr.shape[1] == 4:
        return arr
    if arr.shape[-1] == 4:
        return np.transpose(arr, (0, 3, 1, 2))
    raise ValueError(f"cannot find channel axis in {arr.shape}")


def resoftmax_probs(raw: np.ndarray, last_idx: int = -1) -> np.ndarray:
    """The reference's x100 re-softmax over the token slice [1:last_idx]
    (pipeline:216-218), scattered back into the full K width (invalid slots
    0) — numerically identical to the JAX side's masked softmax
    (guidance/losses.py compute_token_stats; pinned by
    tests/test_parity_trace.py::test_resoftmax_matches_repo)."""
    out = np.zeros(raw.shape, np.float32)
    sl = raw[:, :, 1:last_idx].astype(np.float32) * 100.0
    e = np.exp(sl - sl.max(-1, keepdims=True))
    out[:, :, 1:last_idx] = e / e.sum(-1, keepdims=True)
    return out


def parse_thresholds(s: str):
    if not s:
        return None
    return {int(k): float(v) for k, v in (p.split(":") for p in s.split(","))}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--repo", required=True, help="path to the Guided-Attention checkout")
    p.add_argument("--model_path", default="CompVis/stable-diffusion-v1-4")
    p.add_argument("--meta_prompt", default="a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]")
    p.add_argument("--seed", type=int, default=28)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--latents", default=None, help=".npy initial latent (NCHW or NHWC)")
    p.add_argument("--out", required=True)
    p.add_argument("--thresholds", default="", help='e.g. "0:1.0"')
    p.add_argument("--hp", default="", help="curHyperParams overrides as JSON")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--max_iter_to_alter", type=int, default=25)
    p.add_argument("--run_standard_sd", action="store_true")
    p.add_argument("--sd_2_1", action="store_true")
    p.add_argument("--half", action="store_true", help="fp16 weights (comparison traces should stay fp32)")
    p.add_argument("--device", default="cuda")
    p.add_argument("--r_sub", type=int, default=12, help="eval-slot count; must match the JAX side (max_refinement_steps+2)")
    p.add_argument("--save_image", default=None)
    args = p.parse_args(argv)

    sys.path.insert(0, args.repo)
    import torch
    import utils.shared_state as state
    from utils import helpers
    import utils.ptp_utils as ptp_utils
    import pipeline_guided_attention as pga
    import run as ref_run
    from config import RunConfig

    device = torch.device(args.device)
    kw = {"revision": "fp16"} if args.half else {}
    model = pga.GuidedAttention.from_pretrained(args.model_path, **kw).to(device)

    config = RunConfig(meta_prompt=args.meta_prompt)
    config.stable = model
    config.n_inference_steps = args.steps
    config.guidance_scale = args.guidance_scale
    config.max_iter_to_alter = args.max_iter_to_alter
    config.run_standard_sd = args.run_standard_sd
    config.sd_2_1 = args.sd_2_1
    config.diagnostic_level = 0
    config.save_all_maps = False
    config.seeds = [args.seed]
    state.config = config

    hp = state.get_hyperparam_states()[0]
    hp.update(json.loads(args.hp) if args.hp else {})
    state.curHyperParams = hp
    thr = parse_thresholds(args.thresholds)
    if thr is not None:
        # explicit CLI thresholds override both channels (reference
        # precedence: request > grid state > RunConfig, run.py:75-79)
        config.thresholds = thr
        hp["thresholds"] = thr
    elif "thresholds" in hp:
        # overrideConfig parity (run.py:75-79): the grid state's thresholds
        # ({0: 1.0} by default, shared_state.py:21) replace RunConfig's —
        # this is the reference's EFFECTIVE default, and what the JAX side's
        # HyperParams defaults to
        config.thresholds = hp["thresholds"]
    if hasattr(ref_run, "register_custom_loss") and hasattr(ref_run, "ToLeftOf"):
        ref_run.register_custom_loss("toLeftOf", ref_run.ToLeftOf())
    ref_run.parseMetaPrompt(config)

    # ---- recording hooks ----
    rec = {"pending": None, "records": [], "groups": [], "last_latent": None}
    K, R = 77, config.attention_res

    orig_agg = pga.aggregate_attention

    def agg_hook(*a, **k):
        out = orig_agg(*a, **k)
        if out.ndim == 3 and out.shape == (R, R, K):
            rec["pending"] = out.detach().float().cpu().clone().numpy()
        return out

    pga.aggregate_attention = agg_hook

    def probs77(raw):
        last = -1
        if args.sd_2_1:
            last = len(model.tokenizer(config.prompt)["input_ids"]) - 1
        return resoftmax_probs(raw, last)

    orig_cl = pga.GuidedAttention._compute_loss

    def cl_hook(losses_dict, return_losses: bool = False):
        out = orig_cl(losses_dict, return_losses)
        if rec["pending"] is not None:
            raw, rec["pending"] = rec["pending"], None
            unv = np.zeros(K, np.float32)
            for idx, v in out[2]:
                if idx is not None:
                    unv[idx] = float(v)
            rec["records"].append(
                {
                    "step": int(state.cur_time_step_iter),
                    "loss": float(out[0]),
                    "unscaled": unv,
                    "probs": probs77(raw).astype(np.float16),
                }
            )
        return out

    pga.GuidedAttention._compute_loss = staticmethod(cl_hook)
    pga.GuidedAttention.save_viridis = lambda self, *a, **k: None

    orig_lls = helpers.log_latent_stats

    def lls_hook(latent, per_channel=False):
        orig_lls(latent, per_channel)
        lat = latent.detach().float().cpu().numpy()  # [1,4,h,w]
        absl = np.abs(lat)
        rec["last_latent"] = lat
        rec["groups"].append(
            {
                "step": int(state.cur_time_step_iter),
                "records": rec["records"],
                "mean": lat.mean(axis=(0, 2, 3)),
                "std": absl.std(axis=(0, 2, 3)),
                "p99": np.quantile(absl[0].reshape(4, -1), 0.99, axis=1),
            }
        )
        rec["records"] = []

    helpers.log_latent_stats = lls_hook

    # ---- the run (mirrors run.run_on_prompt, run.py:44-65, plus latents) ----
    init_t = None
    if args.latents:
        init = nchw(np.load(args.latents)).astype(np.float32)
        init_t = torch.from_numpy(init).to(device=device, dtype=model.unet.dtype)
    g = torch.Generator(args.device).manual_seed(args.seed)
    controller = ptp_utils.AttentionStore()
    ptp_utils.register_attention_control(model, controller)
    outputs = model(
        prompt=config.prompt,
        attention_store=controller,
        attention_res=config.attention_res,
        guidance_scale=args.guidance_scale,
        generator=g,
        latents=init_t,
        num_inference_steps=args.steps,
        max_iter_to_alter=args.max_iter_to_alter,
        run_standard_sd=args.run_standard_sd,
        thresholds=config.thresholds,
        scale_factor=config.scale_factor,
        scale_range=config.scale_range,
        smooth_attentions=config.smooth_attentions,
        sigma=config.sigma,
        kernel_size=config.kernel_size,
        sd_2_1=args.sd_2_1,
    )
    if args.save_image:
        outputs.images[0].save(args.save_image)

    # ---- assemble per-step arrays: last recursion's group wins ----
    S, R_sub = args.steps, args.r_sub
    by_step = {}
    for grp in rec["groups"]:
        by_step[grp["step"]] = grp  # later (deeper-recursion) groups overwrite

    total_loss = np.zeros(S, np.float32)
    eval_unscaled = np.zeros((S, R_sub, K), np.float32)
    eval_mask = np.zeros((S, R_sub), bool)
    eval_maps = np.zeros((S, R_sub, R, R, K), np.float16)
    lmean = np.zeros((S, 4), np.float32)
    lstd = np.zeros((S, 4), np.float32)
    lp99 = np.zeros((S, 4), np.float32)
    for i in range(S):
        grp = by_step.get(i)
        if grp is None:
            continue
        lmean[i], lstd[i], lp99[i] = grp["mean"], grp["std"], grp["p99"]
        rs = grp["records"]
        if not rs:
            continue
        total_loss[i] = rs[-1]["loss"]
        # slots: 0 = eval0; refinement bodies 1..n; final fresh fwd = R_sub-1
        for j, r in enumerate(rs):
            slot = 0 if j == 0 else (R_sub - 1 if j == len(rs) - 1 else j)
            eval_unscaled[i, slot] = r["unscaled"]
            eval_mask[i, slot] = True
            eval_maps[i, slot] = r["probs"]

    final_lat = rec["last_latent"]
    final_nhwc = (
        np.transpose(final_lat, (0, 2, 3, 1))[0] if final_lat is not None else np.zeros((0,), np.float32)
    )
    init_nhwc = (
        np.transpose(init, (0, 2, 3, 1))[0] if init_t is not None else np.zeros((0,), np.float32)
    )
    meta = {
        "side": "torch",
        "meta_prompt": args.meta_prompt,
        "prompt": config.prompt,
        "seed": args.seed,
        "steps": args.steps,
        "model": args.model_path,
        "dtype": "fp16" if args.half else "fp32",
        "thresholds": args.thresholds or "",
        "hp": {k: str(v) for k, v in hp.items()},
        "guidance_scale": args.guidance_scale,
        "run_standard_sd": args.run_standard_sd,
    }
    np.savez_compressed(
        args.out,
        total_loss=total_loss,
        eval_unscaled=eval_unscaled,
        eval_mask=eval_mask,
        eval_maps=eval_maps,
        latent_mean=lmean,
        latent_std=lstd,
        latent_p99=lp99,
        init_latents=init_nhwc,
        final_latents=final_nhwc,
        meta=json.dumps(meta),
    )
    print(f"trace -> {args.out} (S={S})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

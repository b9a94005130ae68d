"""Real-weights parity trace harness (repo side).

Dumps per-step guidance trajectories from a FIXED initial latent so a run of
this framework can be compared numerically against the PyTorch reference
(/root/reference) once real SD weights are available locally. The
reference-side counterpart is scripts/reference_trace.py (runs in the
reference's torch/diffusers environment and writes the SAME npz schema).
Protocol + tolerance documented in docs/MIGRATION.md ("Parity tracing").

Usage:
  # produce a trace (random-init weights unless --checkpoint is given)
  python scripts/parity_trace.py trace --model sd15 --checkpoint /ckpt/dir \
      --meta_prompt "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]" \
      --seed 28 --steps 10 --out trace.npz [--latents init.npy] [--cpu]

  # compare two traces
  python scripts/parity_trace.py compare a.npz b.npz --rtol 1e-3 --atol 1e-4

npz schema (shared by both sides; layouts are the repo's NHWC / [R,R,K]):
  total_loss      f32[S]            final-eval loss of the last recursion
                                    (reference pipeline:973 or :577)
  eval_unscaled   f32[S,R_sub,K]    per-eval-slot per-token unscaled losses;
                                    slot 0 = eval0, 1.. = refinement
                                    subiters, R_sub-1 = final fresh forward
  eval_mask       bool[S,R_sub]     which slots ran
  eval_maps       f16[S,R_sub,R,R,K] per-slot re-softmaxed (UNsmoothed)
                                    aggregated cross maps (reference
                                    pipeline:217-219)
  latent_mean     f32[S,C]          post-scheduler-step latent stats
  latent_std      f32[S,C]          (std of |latent|, helpers.py:309-331)
  latent_p99      f32[S,C]
  init_latents    f32[h,w,C]        the initial latent actually used
  final_latents   f32[h,w,C]
  meta            json string       prompt/seed/steps/model/hyperparams

The initial latent interchange file (``--latents`` / ``--save_latents``) is a
plain .npy in EITHER torch NCHW [1,4,h,w] or JAX NHWC [1,h,w,4] layout —
detected by which axis is 4 — so one file serves both sides.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_latents(arr: np.ndarray) -> np.ndarray:
    """Accept [1,C,h,w] (torch) or [1,h,w,C] (JAX); return NHWC fp32."""
    if arr.ndim != 4 or arr.shape[0] != 1:
        raise ValueError(f"initial latents must be [1,...], got {arr.shape}")
    if arr.shape[-1] == 4:
        return arr.astype(np.float32)
    if arr.shape[1] == 4:
        return np.transpose(arr, (0, 2, 3, 1)).astype(np.float32)
    raise ValueError(f"cannot find channel axis of size 4 in {arr.shape}")


def parse_thresholds(s: str):
    if not s:
        return None
    out = {}
    for part in s.split(","):
        k, v = part.split(":")
        out[int(k)] = float(v)
    return out


def cmd_trace(args) -> int:
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline, _seed_u32

    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    sd = StableDiffusion.create(args.model, dtype=dtype, checkpoint_dir=args.checkpoint)
    pipe = GuidedAttentionPipeline(sd)

    if args.latents:
        init = _norm_latents(np.load(args.latents))
    else:
        lat0, _ = pipe._derive_jit(_seed_u32(args.seed))
        init = np.asarray(lat0, np.float32)
    if args.save_latents:
        np.save(args.save_latents, init)
        print(f"initial latents -> {args.save_latents}", file=sys.stderr)

    hp_over = json.loads(args.hp) if args.hp else {}
    thresholds = parse_thresholds(args.thresholds)
    from guided_attention_tpu.config import HyperParams

    hp = HyperParams(**hp_over) if hp_over else None

    out = pipe.dispatch(
        meta_prompt=args.meta_prompt,
        seed=args.seed,
        hp=hp,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        max_iter_to_alter=args.max_iter_to_alter,
        run_standard_sd=args.run_standard_sd,
        thresholds=thresholds,
        sd_2_1=args.sd_2_1,
        latents=jnp.asarray(init),
        decode=False,
        capture_diagnostics=True,
        capture_eval_maps=True,
    ).result()
    d = out.diagnostics

    meta = {
        "side": "jax",
        "meta_prompt": args.meta_prompt,
        "prompt": out.prompt,
        "seed": args.seed,
        "steps": args.steps,
        "model": args.model,
        "dtype": args.dtype,
        "thresholds": args.thresholds or "",
        "hp": hp_over,
        "guidance_scale": args.guidance_scale,
        "run_standard_sd": args.run_standard_sd,
    }
    np.savez_compressed(
        args.out,
        total_loss=np.asarray(d.total_loss, np.float32),
        eval_unscaled=np.asarray(d.eval_unscaled, np.float32),
        eval_mask=np.asarray(d.eval_mask, bool),
        eval_maps=np.asarray(d.eval_maps, np.float16),
        latent_mean=np.asarray(d.latent_mean, np.float32),
        latent_std=np.asarray(d.latent_std, np.float32),
        latent_p99=np.asarray(d.latent_p99, np.float32),
        init_latents=init[0],
        final_latents=np.asarray(out.latents, np.float32)[0]
        if out.latents is not None
        else np.zeros((0,), np.float32),
        meta=json.dumps(meta),
    )
    print(f"trace -> {args.out} (S={args.steps})", file=sys.stderr)
    return 0


# keys compared (when present in both). When --rtol/--atol are left at their
# defaults, per-key tolerances from _KEY_TOL apply: eval_maps gets a looser
# floor because both sides quantize through f16 (rel eps 2^-11 ~ 4.9e-4, and
# values near 1/77 make the default atol=1e-4 tighter than one f16 ulp).
_COMPARE_KEYS = (
    "total_loss",
    "eval_unscaled",
    "eval_maps",
    "latent_mean",
    "latent_std",
    "latent_p99",
    "init_latents",
    "final_latents",
)
_DEFAULT_RTOL, _DEFAULT_ATOL = 1e-3, 1e-4
_KEY_TOL = {"eval_maps": (5e-3, 1e-3)}


def _key_tolerances(key: str, args) -> tuple:
    """(rtol, atol) for one compared key: explicit flags always win; at the
    defaults, f16-quantized keys use their looser per-key floor."""
    rtol = args.rtol if args.rtol is not None else _DEFAULT_RTOL
    atol = args.atol if args.atol is not None else _DEFAULT_ATOL
    if args.rtol is None and args.atol is None and key in _KEY_TOL:
        rtol, atol = _KEY_TOL[key]
    return rtol, atol


def cmd_compare(args) -> int:
    a = np.load(args.a, allow_pickle=False)
    b = np.load(args.b, allow_pickle=False)
    for f, name in ((a, args.a), (b, args.b)):
        if "meta" in f:
            print(f"{name}: {json.loads(str(f['meta']))}", file=sys.stderr)

    ok = True
    mask = None
    if "eval_mask" in a and "eval_mask" in b:
        ma, mb = a["eval_mask"], b["eval_mask"]
        S = min(ma.shape[0], mb.shape[0])
        Rs = min(ma.shape[1], mb.shape[1])
        if not np.array_equal(ma[:S, :Rs], mb[:S, :Rs]):
            # differing eval counts = differing control flow: report, compare
            # only jointly-valid slots
            print(
                f"eval_mask DIFFERS (control flow diverged on "
                f"{int((ma[:S, :Rs] != mb[:S, :Rs]).sum())} slots) — comparing joint slots only"
            )
            ok = False
        mask = ma[:S, :Rs] & mb[:S, :Rs]

    for key in _COMPARE_KEYS:
        if key not in a or key not in b:
            continue
        xa, xb = a[key].astype(np.float64), b[key].astype(np.float64)
        S = min(xa.shape[0], xb.shape[0]) if xa.ndim else 0
        if xa.ndim and xb.ndim and xa.shape[1:] != xb.shape[1:]:
            print(f"{key}: SHAPE MISMATCH {xa.shape} vs {xb.shape}")
            ok = False
            continue
        xa, xb = xa[:S], xb[:S]
        if key.startswith("eval_") and mask is not None and xa.ndim >= 2:
            m = mask[:S, : xa.shape[1]]
            sel = np.broadcast_to(
                m.reshape(m.shape + (1,) * (xa.ndim - 2)), xa.shape
            )
            xa, xb = xa[sel], xb[sel]
        if xa.size == 0:
            print(f"{key}: (empty after masking)")
            continue
        adiff = np.abs(xa - xb)
        denom = np.maximum(np.abs(xb), 1e-12)
        max_abs = float(adiff.max())
        max_rel = float((adiff / denom).max())
        rtol, atol = _key_tolerances(key, args)
        close = np.allclose(xa, xb, rtol=rtol, atol=atol)
        status = "OK " if close else "FAIL"
        print(
            f"{status} {key:16s} max_abs={max_abs:.3e} max_rel={max_rel:.3e} "
            f"n={xa.size} (rtol={rtol:g} atol={atol:g})"
        )
        ok = ok and close
    print("PARITY: " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("trace", help="run a generation and dump the trajectory")
    t.add_argument("--model", default="sd15", help="config name: sd15/sd21/micro")
    t.add_argument("--checkpoint", default=None, help="local checkpoint dir (native or HF-torch layout)")
    t.add_argument("--meta_prompt", default="a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]")
    t.add_argument("--seed", type=int, default=28)
    t.add_argument("--steps", type=int, default=10)
    t.add_argument("--latents", default=None, help=".npy initial latent (NCHW or NHWC)")
    t.add_argument("--save_latents", default=None, help="write the initial latent used to this .npy")
    t.add_argument("--out", required=True)
    t.add_argument("--dtype", choices=("fp32", "bf16"), default="fp32")
    t.add_argument("--thresholds", default="", help='e.g. "0:1.0" or "0:0.1,3:0.8"')
    t.add_argument("--hp", default="", help='HyperParams overrides as JSON, e.g. {"recurse_steps":1}')
    t.add_argument("--guidance_scale", type=float, default=7.5)
    t.add_argument("--max_iter_to_alter", type=int, default=25)
    t.add_argument("--run_standard_sd", action="store_true")
    t.add_argument("--sd_2_1", action="store_true")
    t.add_argument("--cpu", action="store_true", help="force the CPU backend (fp32 parity runs)")
    t.set_defaults(fn=cmd_trace)

    c = sub.add_parser("compare", help="compare two trace npz files")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument(
        "--rtol", type=float, default=None,
        help=f"uniform rtol for every key (default: {_DEFAULT_RTOL:g}, with "
        "per-key overrides for f16-quantized keys — see _KEY_TOL)",
    )
    c.add_argument(
        "--atol", type=float, default=None,
        help=f"uniform atol (default: {_DEFAULT_ATOL:g}; same per-key rule)",
    )
    c.set_defaults(fn=cmd_compare)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

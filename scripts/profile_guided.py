"""Profile the guided generation on the real TPU and print an op-level time
breakdown (VERDICT r3 item 3: certify or refute the conv-bound ~39% MFU
ceiling with a trace instead of end-to-end arithmetic).

  python scripts/profile_guided.py [--logdir DIR] [--steps 50] [--quick]
  python scripts/profile_guided.py --analyze DIR      # re-parse an old trace

Runs one warmup generation (compile), then ONE profiled generation under
``jax.profiler.trace``, parses the xplane with jax.profiler.ProfileData, and
prints:
  * top-K HLO ops by total device time (aggregated over executions, with
    shapes from the HLO text),
  * category totals (convolution / matmul / attention custom-calls / other),
  * device busy time vs module wall time (idle = scheduling gaps).
Results land in docs/PERF.md ("Trace-verified breakdown").
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

META_PROMPT = "a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55]"


def run_profiled(logdir: str, steps: int, quick: bool) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline

    sd = StableDiffusion.create(
        "micro" if quick else "sd15", dtype=jnp.float32 if quick else jnp.bfloat16
    )
    pipe = GuidedAttentionPipeline(sd)

    def run(seed):
        return pipe(
            meta_prompt=META_PROMPT, seed=seed, num_inference_steps=steps,
            decode=True, capture_diagnostics=False,
        )

    print("warmup (compile)...", file=sys.stderr)
    run(99)
    print("profiling one generation...", file=sys.stderr)
    with jax.profiler.trace(logdir):
        out = run(28)
        assert out.images is not None


_NAME_RE = re.compile(r"%([a-zA-Z0-9_.\-]+) =")
_SUFFIX_RE = re.compile(r"[._\-]?[0-9]+$")


def _agg_key(event_name: str) -> str:
    """%fusion.123 -> fusion-family key with its base name kept (base names
    encode the originating op: convolution_reduce_fusion, loop_add_fusion...)."""
    m = _NAME_RE.search(event_name)
    name = m.group(1) if m else event_name[:60]
    return _SUFFIX_RE.sub("", name)


# the opcode token sits between the output shape (which ends in a layout
# brace, or a paren for tuple outputs) and the operand list's open paren
_OPCODE_RE = re.compile(r"[})]\s+([a-z][a-z0-9\-]*)\(")


def _category(event_name: str) -> str:
    """Categorize by the op's OWN opcode (the token before its operand
    list), never by operand text — a fusion whose inputs come from a
    custom-call must not count as a custom-call."""
    n = event_name
    m = _OPCODE_RE.search(n)
    op = m.group(1) if m else ""
    base = n.split(" = ")[0]
    if op == "convolution" or "convolution" in base:
        return "convolution"
    if op == "custom-call":
        return "custom-call (pallas)"
    if op == "dot":
        return "matmul"
    if op.startswith("copy") or "copy" in base or "slice-done" in base:
        return "copy/layout"
    if op == "fusion" or "fusion" in base:
        return "elementwise/other fusion"
    return "other"


def analyze(logdir: str, top: int = 15) -> None:
    from jax.profiler import ProfileData

    pbs = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    path = pbs[-1]
    print(f"# trace: {path}\n")
    p = ProfileData.from_file(path)

    ops = {}
    cats = {}
    module_ns = 0.0
    busy_ns = 0.0
    for plane in p.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ns += sum(e.duration_ns for e in line.events)
            if line.name != "XLA Ops":
                continue
            # The ops timeline NESTS (while > conditional > fusion > ...):
            # attribute SELF time only, or parents double-count children
            # (observed 361% "busy" with naive summing). Events sorted by
            # (start, -end) visit parents before their children; a stack
            # tracks enclosure and children subtract from the parent's self.
            evs = sorted(line.events, key=lambda e: (e.start_ns, -e.end_ns))
            stack = []  # (end_ns, self_ns_accumulator_key_index)
            selfs = []  # parallel list: [name, self_ns]
            for e in evs:
                while stack and e.start_ns >= stack[-1][0]:
                    stack.pop()
                if stack:
                    selfs[stack[-1][1]][1] -= e.duration_ns
                selfs.append([e.name, e.duration_ns])
                stack.append((e.end_ns, len(selfs) - 1))
            for name, self_ns in selfs:
                d = max(self_ns, 0.0)
                busy_ns += d
                key = _agg_key(name)
                rec = ops.setdefault(key, [0.0, 0, name])
                rec[0] += d
                rec[1] += 1
                c = _category(name)
                cats[c] = cats.get(c, 0.0) + d

    total = busy_ns or 1.0
    print(f"module wall time : {module_ns/1e6:10.1f} ms")
    print(f"device busy time : {busy_ns/1e6:10.1f} ms  ({100*busy_ns/max(module_ns,1):.1f}% of module wall)")
    print(f"idle/gaps        : {(module_ns-busy_ns)/1e6:10.1f} ms\n")

    print(f"{'category':32s} {'ms':>10s} {'%busy':>7s}")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{c:32s} {d/1e6:10.1f} {100*d/total:6.1f}%")

    print(f"\ntop {top} ops by total device time:")
    print(f"{'op (aggregated)':44s} {'ms':>9s} {'%busy':>7s} {'count':>7s}")
    for key, (d, n, example) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{key[:44]:44s} {d/1e6:9.1f} {100*d/total:6.1f}% {n:7d}")
    print("\nexample HLO of the top op:")
    top_example = max(ops.values(), key=lambda r: r[0])[2]
    print("  " + top_example[:400])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--logdir", default="/tmp/guided_profile")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--quick", action="store_true", help="micro model (smoke)")
    ap.add_argument("--analyze", default=None, help="only parse an existing trace dir")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args(argv)
    if args.analyze:
        analyze(args.analyze, args.top)
        return 0
    run_profiled(args.logdir, args.steps, args.quick)
    analyze(args.logdir, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

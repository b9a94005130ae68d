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


def dump_fused_hlo(pipe, steps: int, out_path: str, batch: int = 0) -> None:
    """Write the OPTIMIZED HLO of the fused generate program (or the batch
    program with --batch) so the analyzer can join xplane fusion events to
    their fused-computation bodies and name the op family each unnamed
    %fusion.N actually computes (VERDICT r4 next #1: the 64.8% unnamed pool).
    Compilation is remote; ``compiled.as_text()`` ships the optimized module
    text back over the tunnel (a few hundred MB of text for the full
    program — seconds, one-off)."""
    from guided_attention_tpu.runner import PrepareOptions, _seed_u32

    opts = PrepareOptions(
        meta_prompt=META_PROMPT, num_inference_steps=steps,
        capture_diagnostics=False,
    )
    hp, _prompt, _anns, spec, statics, sched, arrays, emb = pipe._prepare(opts)
    if batch:
        import jax.numpy as jnp

        from guided_attention_tpu.parallel.batch import build_batch_generate

        mesh = pipe._default_batch_mesh(batch)
        gen = build_batch_generate(pipe.sd, statics, hp, mesh)
        lat0, keys = pipe._batch_init_jit(
            jnp.arange(1, batch + 1, dtype=jnp.uint32)
        )
        with mesh:
            lowered = gen.jit_for(pipe.sd.params).lower(
                pipe.sd.params, emb, lat0, spec, sched, arrays, keys
            )
    else:
        fused = pipe._get_fused(statics, hp)
        lowered = fused.lower(
            pipe.sd.params, emb, _seed_u32(28), spec, sched, arrays
        )
    txt = lowered.compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"optimized HLO ({len(txt)/1e6:.1f} MB text) -> {out_path}", file=sys.stderr)


def run_profiled(logdir: str, steps: int, quick: bool, batch: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("GA_PROFILE_CPU") == "1":
        # smoke-testing the profile+dump+join flow without the chip (this
        # sandbox re-pins JAX_PLATFORMS=axon; the config update is the only
        # override that sticks — tests/conftest.py does the same)
        jax.config.update("jax_platforms", "cpu")
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
        if batch:
            return pipe.generate_batch(
                [seed * 31 + i for i in range(batch)], meta_prompt=META_PROMPT,
                num_inference_steps=steps, capture_diagnostics=False,
            )
        return pipe(
            meta_prompt=META_PROMPT, seed=seed, num_inference_steps=steps,
            decode=True, capture_diagnostics=False,
        )

    print("warmup (compile)...", file=sys.stderr)
    run(99)
    os.makedirs(logdir, exist_ok=True)
    try:
        dump_fused_hlo(pipe, steps, os.path.join(logdir, "module.hlo.txt"), batch=batch)
    except Exception as e:  # noqa: BLE001 — the trace is still useful alone
        print(f"HLO dump failed ({type(e).__name__}: {e}); "
              "analyzer will fall back to event-text categories", file=sys.stderr)
    print("profiling one generation...", file=sys.stderr)
    with jax.profiler.trace(logdir):
        out = run(28)
        if batch:
            assert out[0].images is not None
        else:
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
# brace, a paren for tuple outputs, or a bare ']' for layout-less scalars)
_OPCODE_RE = re.compile(r"[})\]]\s+([a-z][a-z0-9\-]*)\(")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
# computation header: `%fused_computation.12.clone (p0: bf16[...]) -> ... {`
_COMP_HDR_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->.*\{")

# opcodes that are pure data movement / bookkeeping (a fusion containing ONLY
# these computes nothing — it rearranges bytes)
_DATA_OPS = frozenset(
    "copy copy-start copy-done transpose reshape bitcast slice dynamic-slice "
    "dynamic-update-slice concatenate pad broadcast reverse parameter "
    "constant tuple get-tuple-element iota gather".split()
)


def _classify_opcodes(ops) -> str:
    """Name the op family a fused computation spends its cycles on, by
    FLOPs-dominance priority: a fusion containing a conv is a conv fusion no
    matter how many elementwise ops ride along (XLA fuses producers/consumers
    into the conv's loop)."""
    s = set(ops)
    if "convolution" in s:
        return "conv"
    if "dot" in s:
        return "matmul"
    if "custom-call" in s:
        return "custom-call"
    if s & {"rng", "rng-bit-generator"}:
        return "rng"
    if s & {"reduce", "reduce-window"}:
        return "reduce"
    if "scatter" in s:
        return "scatter"
    if s - _DATA_OPS - {"fusion"}:
        return "elementwise"
    return "data-movement"


def parse_hlo_fusion_classes(path: str):
    """Optimized-HLO text -> (classes, instr_to_comp):
    classes: {computation_name: (class, detail)} — detail keeps the
    heaviest-op line for reporting (conv/dot output shape);
    instr_to_comp: {fusion_instruction_name: called_computation_name} — the
    fallback join when an xplane event's text elides its `calls=` clause."""
    classes = {}
    instr_to_comp = {}
    cur = None
    ops = []
    detail = ""
    with open(path, "r", errors="replace") as f:
        for line in f:
            if cur is None:
                m = _COMP_HDR_RE.match(line)
                if m:
                    cur, ops, detail = m.group(1), [], ""
                continue
            if line.startswith("}"):
                classes[cur] = (_classify_opcodes(ops), detail)
                cur = None
                continue
            m = _OPCODE_RE.search(line)
            if not m:
                continue
            op = m.group(1)
            ops.append(op)
            if op == "fusion":
                nm = _NAME_RE.search(line)
                cm = _CALLS_RE.search(line)
                if nm and cm:
                    instr_to_comp[nm.group(1)] = cm.group(1)
            if op in ("convolution", "dot", "custom-call", "reduce") and not detail:
                detail = line.strip()[:160]
    return classes, instr_to_comp


def _category(event_name: str, hlo_classes=None) -> str:
    """Categorize by the op's OWN opcode (the token before its operand
    list), never by operand text — a fusion whose inputs come from a
    custom-call must not count as a custom-call. With an optimized-HLO dump
    (hlo_classes), unnamed %fusion.N events are resolved through their
    `calls=` computation body into a NAMED family (fusion:conv,
    fusion:reduce, ...) — the r4 trace left 64.8% of device time in an
    opaque fusion pool without this."""
    n = event_name
    m = _OPCODE_RE.search(n)
    op = m.group(1) if m else ""
    base = n.split(" = ")[0]
    if op == "convolution" or "convolution" in base:
        return "convolution (named)"
    if op == "custom-call":
        return "custom-call (pallas)"
    if op == "dot":
        return "matmul (named)"
    if op.startswith("copy") or "copy" in base or "slice-done" in base:
        return "copy/layout"
    if op == "fusion" or "fusion" in base:
        if hlo_classes is not None:
            classes, instr_to_comp = hlo_classes
            c = _CALLS_RE.search(n)
            if c and c.group(1) in classes:
                return f"fusion:{classes[c.group(1)][0]}"
            # event text elides calls= for some fusion kinds: join by the
            # fusion INSTRUCTION name through the module's own calls table
            nm = _NAME_RE.search(n)
            if nm and instr_to_comp.get(nm.group(1)) in classes:
                return f"fusion:{classes[instr_to_comp[nm.group(1)]][0]}"
            return "fusion:unjoined"
        return "elementwise/other fusion"
    if op in ("while", "conditional", "call"):
        return "control (self)"
    if op in ("dynamic-slice", "dynamic-update-slice", "slice", "bitcast", "transpose", "reshape"):
        return "copy/layout"
    return "other"


def analyze(logdir: str, top: int = 15, hlo: str = None) -> None:
    from jax.profiler import ProfileData

    pbs = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    path = pbs[-1]
    print(f"# trace: {path}\n")

    hlo_classes = None
    hlo_path = hlo or os.path.join(logdir, "module.hlo.txt")
    if os.path.exists(hlo_path):
        hlo_classes = parse_hlo_fusion_classes(hlo_path)
        print(
            f"# HLO join: {hlo_path} ({len(hlo_classes[0])} computations, "
            f"{len(hlo_classes[1])} fusion call sites)\n"
        )
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
                c = _category(name, hlo_classes)
                # aggregation key: fusions aggregate by their FULL called-
                # computation name (each fused_computation.N is a distinct
                # body — suffix-stripping would collapse every unnamed
                # %fusion.N into one opaque row); everything else by
                # suffix-stripped base name
                key = None
                if c.startswith("fusion:") and hlo_classes is not None:
                    cm = _CALLS_RE.search(name)
                    if cm is None:
                        nm = _NAME_RE.search(name)
                        key = hlo_classes[1].get(nm.group(1)) if nm else None
                    else:
                        key = cm.group(1)
                if key is None:
                    key = _agg_key(name)
                rec = ops.setdefault((key, c), [0.0, 0, name, c])
                rec[0] += d
                rec[1] += 1
                cats[c] = cats.get(c, 0.0) + d

    total = busy_ns or 1.0
    print(f"module wall time : {module_ns/1e6:10.1f} ms")
    print(f"device busy time : {busy_ns/1e6:10.1f} ms  ({100*busy_ns/max(module_ns,1):.1f}% of module wall)")
    print(f"idle/gaps        : {(module_ns-busy_ns)/1e6:10.1f} ms\n")

    unnamed = sum(
        d for c, d in cats.items() if c in ("fusion:unjoined", "other", "elementwise/other fusion")
    )
    named_pct = 100 * (total - unnamed) / total
    print(
        f"named attribution: {named_pct:.1f}% of device "
        f"time in named op families ({unnamed/1e6:.1f} ms unattributed)"
    )
    if named_pct < 90 and total > 1e6:
        print(
            "WARNING: below the 90% attribution bar — is the HLO dump "
            "missing/stale for this trace? (pass --hlo, or re-run the "
            "profile so module.hlo.txt matches the program)"
        )
    print()

    print(f"{'category':32s} {'ms':>10s} {'%busy':>7s}")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{c:32s} {d/1e6:10.1f} {100*d/total:6.1f}%")

    print(f"\ntop {top} ops by total device time:")
    print(f"{'op (aggregated)':44s} {'ms':>9s} {'%busy':>7s} {'count':>7s}  class")
    for (key, _c), (d, n, example, c) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{key[:44]:44s} {d/1e6:9.1f} {100*d/total:6.1f}% {n:7d}  {c}")

    if hlo_classes is not None:
        # per-family drill-down: the top aggregated instances of each of the
        # largest fusion families, with the heaviest inner-op line (shape)
        classes, instr_to_comp = hlo_classes
        fam_tot = {c: d for c, d in cats.items() if c.startswith("fusion:")}
        for fam in sorted(fam_tot, key=lambda c: -fam_tot[c])[:4]:
            members = [
                (key, rec) for (key, kc), rec in ops.items() if kc == fam
            ]
            members.sort(key=lambda kr: -kr[1][0])
            print(f"\n{fam} — {fam_tot[fam]/1e6:.1f} ms total; top instances:")
            for key, (d, n, example, _c) in members[:6]:
                # key IS the called-computation name for joined fusions
                detail = classes.get(key, ("", ""))[1]
                print(f"  {key[:40]:40s} {d/1e6:8.1f} ms x{n:5d}  {detail[:90]}")

    if ops:
        print("\nexample HLO of the top op:")
        top_example = max(ops.values(), key=lambda r: r[0])[2]
        print("  " + top_example[:400])
    else:
        print("(no /device: XLA Ops planes in this trace — CPU run?)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--logdir", default="/tmp/guided_profile")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--quick", action="store_true", help="micro model (smoke)")
    ap.add_argument("--analyze", default=None, help="only parse an existing trace dir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--hlo", default=None,
                    help="optimized-HLO text to join fusion names against "
                    "(default: <logdir>/module.hlo.txt when present)")
    ap.add_argument("--batch", type=int, default=0,
                    help="profile generate_batch at this batch size instead "
                    "of the single-sample fused program")
    args = ap.parse_args(argv)
    if args.analyze:
        analyze(args.analyze, args.top, hlo=args.hlo)
        return 0
    run_profiled(args.logdir, args.steps, args.quick, batch=args.batch)
    analyze(args.logdir, args.top, hlo=args.hlo)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

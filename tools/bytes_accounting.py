"""Bytes-by-tensor accounting of the compiled training step.

The round-2 roofline says the bf16 step moves ~22.9 GB/step at 99% of v5e
HBM peak — but that number is a module-level aggregate. This tool breaks
it down: it compiles the SAME step bench.py measures, walks the optimized
HLO's entry computation, and charges every instruction its operand-read +
output-write bytes (post-fusion, i.e. values internal to a fusion are
free, exactly XLA's HBM traffic model). It then aggregates:

  * per-instruction top-N (which buffers dominate),
  * per-source-region (jax op_name metadata: sampler rounds vs field
    forward vs backward transpose vs optimizer),

so "the remaining traffic is irreducible" becomes a checkable claim
instead of an inference.

Usage:
    python tools/bytes_accounting.py [--platform cpu|axon] [--top 40]
        [--dtype bfloat16|float32] [--out report.md]
"""

from __future__ import annotations

import argparse
import collections
import json
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "token": 0,
}

SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(dtype: str, dims: str) -> int:
    if dtype not in DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dtype]


def parse_computation_opnames(hlo_text: str):
    """comp name -> multiset of op_name metadata inside (for attributing
    fusions whose representative op carries no scope)."""
    comps = {}
    for m in re.finditer(
        r"^%([\w.\-]+) [^{]*\{(.*?)^\}", hlo_text, re.S | re.M
    ):
        comps[m.group(1)] = re.findall(r'op_name="([^"]+)"', m.group(2))
    return comps


def parse_entry_instructions(hlo_text: str):
    """Yield (name, opcode, out_bytes, operand_bytes, op_name_metadata,
    called_comp) for each instruction of the ENTRY computation."""
    # locate the ENTRY computation body
    m = re.search(r"^ENTRY [^{]*\{(.*?)^\}", hlo_text, re.S | re.M)
    if not m:
        raise ValueError("no ENTRY computation found")
    body = m.group(1)
    # instructions look like:
    #   %name = <shape> opcode(<shape> %op, ...), attrs, metadata={op_name="..."}
    for line in body.splitlines():
        line = line.strip()
        lm = re.match(r"(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if not lm:
            continue
        name, rest = lm.groups()
        opm = re.match(r"(?:\([^)]*\)|\S+)\s+([\w\-]+)\(", rest)
        opcode = opm.group(1) if opm else "?"
        paren = rest.find("(")
        out_part = rest[:paren] if paren >= 0 else rest
        # operand shapes appear inline in the call parens; metadata after
        close = rest.rfind(")")
        call_part = rest[paren + 1: close] if paren >= 0 else ""
        # strip called-computation bodies referenced by name only (no shapes)
        out_b = sum(shape_bytes(d, s) for d, s in SHAPE_RE.findall(out_part))
        opnd_b = sum(shape_bytes(d, s) for d, s in SHAPE_RE.findall(call_part))
        meta = re.search(r'op_name="([^"]*)"', rest)
        called = re.search(r"calls=%([\w.\-]+)", rest)
        yield (name, opcode, out_b, opnd_b,
               (meta.group(1) if meta else ""),
               (called.group(1) if called else None))


# the jax.named_scope phase names inserted in model/neat.py + train/step.py
SCOPES = (
    "sampler", "field_main", "volume_render", "attraction", "surface_eval",
    "junction_match", "eikonal", "loss", "adam", "batch_sample",
)


def bucket_for(op_name: str, opcode: str) -> str:
    s = op_name
    direction = "bwd" if "transpose(" in s else "fwd"
    for scope in SCOPES:
        if scope in s:
            return f"{scope}/{direction}"
    if opcode in ("copy", "copy-start", "copy-done"):
        return "copies"
    if opcode.startswith("all-") or opcode in ("reduce-scatter",):
        return "collectives"
    return f"other/{direction}"


def build_step(
    dtype: str,
    field: str = "xla",
    beta_search: str = "bisect",
    fused_rounds: str = "off",
):
    """The exact bench.py step configuration (neat_tpu.utils.benchscene is
    the shared single source of truth for it).

    field: 'xla' (unfused field main pass), 'recompute' (pallas fused
    field, backward recomputes the forward in-kernel), or 'stash'
    (pallas fused field, backward reads stashed residuals).
    beta_search: sampler beta line-search ('bisect' = reference 10-step
    bisection, 'grid' = one batched log-spaced candidate pass).
    """
    from neat_tpu.utils.benchscene import bench_config, bench_scene, bench_step

    cfg = bench_config(
        dtype=dtype, field=field, beta_search=beta_search,
        fused_rounds=fused_rounds,
    )
    scene_dev = bench_scene(cfg)
    step, state = bench_step(cfg, donate=False)
    return step, state, scene_dev


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # NO persistent compilation cache here: cache keys ignore op_name
    # metadata, so a cached module may predate the named_scope annotations
    # this tool buckets by

    step, state, scene_dev = build_step(args.dtype)
    rng = jax.random.PRNGKey(1)
    compiled = step.lower(state, scene_dev, rng).compile()
    hlo = compiled.as_text()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
    except Exception:
        cost = {}

    rows = list(parse_entry_instructions(hlo))
    comps = parse_computation_opnames(hlo)
    total = sum(r[2] + r[3] for r in rows)

    def attribute(meta, opcode, called):
        b = bucket_for(meta, opcode)
        if b.startswith("other") and called and called in comps:
            # vote over the fused computation's internal op scopes
            votes = collections.Counter(
                bucket_for(n, "") for n in comps[called]
            )
            votes.pop("other/fwd", None)
            votes.pop("other/bwd", None)
            if votes:
                return votes.most_common(1)[0][0]
        return b

    by_bucket = collections.Counter()
    buckets_of = []
    for name, opcode, out_b, opnd_b, meta, called in rows:
        b = attribute(meta, opcode, called)
        buckets_of.append(b)
        by_bucket[b] += out_b + opnd_b

    lines = []
    lines.append(f"# Bytes accounting — {args.dtype} step, "
                 f"{jax.devices()[0].platform}")
    lines.append("")
    ca_bytes = cost.get("bytes accessed", None) if cost else None
    lines.append(f"entry-computation traffic model: {total / 1e9:.2f} GB/step"
                 + (f" (XLA cost-analysis aggregate: {ca_bytes / 1e9:.2f} GB)"
                    if ca_bytes else ""))
    lines.append("")
    lines.append("## By source region")
    lines.append("")
    lines.append("| region | GB | % |")
    lines.append("|---|---|---|")
    for bucket, b in by_bucket.most_common():
        lines.append(f"| {bucket} | {b / 1e9:.2f} | {100 * b / total:.1f}% |")
    lines.append("")
    lines.append(f"## Top {args.top} instructions")
    lines.append("")
    lines.append("| bytes (MB) | bucket | opcode | op_name |")
    lines.append("|---|---|---|---|")
    order = sorted(
        range(len(rows)), key=lambda i: -(rows[i][2] + rows[i][3])
    )[: args.top]
    for i in order:
        name, opcode, out_b, opnd_b, meta, called = rows[i]
        short = meta if len(meta) < 100 else "..." + meta[-97:]
        lines.append(
            f"| {(out_b + opnd_b) / 1e6:.1f} | {buckets_of[i]} | {opcode} "
            f"| {short} |"
        )
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
    summary = {"total_gb": round(total / 1e9, 3),
               "buckets": {k: round(v / 1e9, 3)
                           for k, v in by_bucket.items()}}
    if cost:
        for key in ("flops", "transcendentals", "bytes accessed"):
            if key in cost:
                summary[key.replace(" ", "_")] = float(cost[key])
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

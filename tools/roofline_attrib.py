"""Per-op roofline attribution: join measured HLO op times with per-op floors.

VERDICT r3 missing #1: the aggregate roofline (tools/roofline.py, 12.84 ms
floor vs 19.88 ms measured @1280 b16) says 40% headroom exists but not WHERE.
This tool localizes it: parse the optimized HLO text that profile_bench.py now
dumps (optimized_hlo.txt.gz), compute each profiled op's individual roofline
floor — max(MXU time of the convs/dots fused into it, HBM time of the bytes
crossing its fusion boundary) — and join against the measured per-op self
times (hlo_stats_full.json). Output: a table of (op, model-layer, measured ms,
floor ms, % of floor, bound), sorted by the residual, plus aggregates.

The model-layer column comes from the conv instruction's op_name metadata
(jit scope path), so "fusion.9 is 3.8 ms" becomes "the neck's csp_p5 3x3 conv
runs at 41% of its floor" — an aimable target.

Usage (offline, no chip needed once the artifacts exist):
  python tools/roofline_attrib.py --dir profiles/r4s1_1280 \
      [--out profiles/conv_attrib_r04.json]
"""
from __future__ import annotations

import argparse
import gzip
import json
import re
from pathlib import Path

HBM_GBPS = 819e9   # v5e
MXU_BF16 = 197e12
MXU_INT8 = 394e12

DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^=]*?\)|\S+)\s+([\w\-]+)\(")


def shape_bytes(shape_text: str) -> int:
    """Total logical bytes of a (possibly tuple) HLO shape string."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_text):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def shape_dims(shape_text: str):
    m = _SHAPE_RE.search(shape_text)
    if not m:
        return None, None
    dims = [int(d) for d in m.group(2).split(",") if d]
    return m.group(1), dims


def parse_hlo(text: str):
    """-> instrs: {name: {shape, opcode, line, computation}},
          fusions: {name: called_computation},
          computations: {comp_name: [instr names]}"""
    instrs, computations = {}, {}
    comp = None
    for line in text.splitlines():
        s = line.strip()
        if s.endswith("{") and ("%" in s or s.startswith("ENTRY")):
            cm = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", s)
            if cm and "=" not in s.split("(")[0]:
                comp = cm.group(1)
                computations[comp] = []
                continue
        m = _INSTR_RE.match(line)
        if m:
            name, shape, opcode = m.groups()
            instrs[name] = {"shape": shape, "opcode": opcode, "line": line,
                            "comp": comp}
            if comp:
                computations[comp].append(name)
    return instrs, computations


def conv_flops(line: str, instrs) -> tuple:
    """FLOPs + metadata scope of one HLO convolution instruction line."""
    _, out_dims = shape_dims(line.split("=", 1)[1])
    # operands: first two %names inside the call parens
    call = line.split("convolution(", 1)[1]
    ops = re.findall(r"%([\w.\-]+)", call)
    dl = re.search(r"dim_labels=(\S+?)[,\s]", line)
    fgc = re.search(r"feature_group_count=(\d+)", line)
    # rhs input-feature dim from dim_labels rhs spec: find 'i' position
    rhs_shape = None
    if len(ops) >= 2 and ops[1] in instrs:
        _, rhs_shape = shape_dims(instrs[ops[1]]["shape"])
    window = re.search(r"window=\{size=([\dx]+)", line)
    wsize = 1
    if window:
        for d in window.group(1).split("x"):
            wsize *= int(d)
    ci_per_group = None
    if dl and rhs_shape:
        rhs_spec = dl.group(1).split("_")[1].split("-")[0]
        i_pos = rhs_spec.index("i")
        ci_per_group = rhs_shape[i_pos]
    if ci_per_group is None:
        ci_per_group = 1
    out_elems = 1
    for d in out_dims or []:
        out_elems *= d
    # grouped/batch-grouped convs: ci_per_group is already per-group
    flops = 2 * out_elems * wsize * ci_per_group
    # dtype of the lhs operand decides the MXU peak
    lhs_dt = None
    if ops and ops[0] in instrs:
        lhs_dt, _ = shape_dims(instrs[ops[0]]["shape"])
    scope = re.search(r'op_name="([^"]+)"', line)
    return flops, (lhs_dt or "bf16"), (scope.group(1) if scope else "")


def dot_flops(line: str, instrs) -> tuple:
    _, out_dims = shape_dims(line.split("=", 1)[1])
    call = line.split("dot(", 1)[1] if "dot(" in line else ""
    ops = re.findall(r"%([\w.\-]+)", call)
    k = 1
    lc = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    if ops and ops[0] in instrs and lc:
        _, lhs_dims = shape_dims(instrs[ops[0]]["shape"])
        if lhs_dims:
            for i in lc.group(1).split(","):
                if i:
                    k *= lhs_dims[int(i)]
    out_elems = 1
    for d in out_dims or []:
        out_elems *= d
    lhs_dt = None
    if ops and ops[0] in instrs:
        lhs_dt, _ = shape_dims(instrs[ops[0]]["shape"])
    scope = re.search(r'op_name="([^"]+)"', line)
    return 2 * out_elems * k, (lhs_dt or "bf16"), (scope.group(1) if scope else "")


def short_scope(scope: str) -> str:
    """jit op_name path -> compact model-layer label."""
    parts = [p for p in scope.split("/") if p and not p.startswith("jit")]
    keep = [p for p in parts if not re.match(
        r"^(convert|transpose\[|broadcast|reshape|add|mul)", p)]
    return "/".join(keep[-4:]) if keep else scope[-60:]


def attribute(hlo_text: str, stats: dict) -> dict:
    instrs, computations = parse_hlo(hlo_text)

    def floor_of(name: str):
        """(floor_us, mxu_us, hbm_us, gflops, scopes) for profiled op `name`."""
        info = instrs.get(name)
        if info is None:
            return None
        line = info["line"]
        # bytes crossing the boundary: unique operands + own output
        call_part = line.split("(", 1)[1] if "(" in line else ""
        # cut at ), metadata or attrs — operand names only appear before kind=
        call_part = call_part.split("kind=")[0].split("metadata=")[0]
        operand_names = []
        for on in re.findall(r"%([\w.\-]+)", call_part):
            if on in instrs and on not in operand_names and on != name:
                operand_names.append(on)
        by = shape_bytes(info["shape"])
        for on in operand_names:
            by += shape_bytes(instrs[on]["shape"])
        # MXU flops: convs/dots inside the called computation (or self),
        # recursing into NESTED fusions (XLA fuses conv-into-conv on TPU —
        # e.g. the serving stem conv is recomputed inside the down1 fusion)
        flops_bf16 = flops_int8 = 0
        scopes = []

        def body_of(instr_name, depth=0):
            if depth > 4:
                return []
            il = instrs[instr_name]["line"]
            cm = re.search(r"calls=%?([\w.\-]+)", il)
            if cm and cm.group(1) in computations:
                out = []
                for sub in computations[cm.group(1)]:
                    if instrs[sub]["opcode"] == "fusion":
                        out.extend(body_of(sub, depth + 1))
                    else:
                        out.append(sub)
                return out
            return [instr_name]

        for iname in body_of(name):
            il = instrs[iname]["line"]
            if instrs[iname]["opcode"] == "convolution":
                f, dt, scope = conv_flops(il, instrs)
            elif instrs[iname]["opcode"] == "dot":
                f, dt, scope = dot_flops(il, instrs)
            else:
                continue
            if dt in ("s8", "u8"):
                flops_int8 += f
            else:
                flops_bf16 += f
            if scope:
                scopes.append(short_scope(scope))
        mxu_s = flops_bf16 / MXU_BF16 + flops_int8 / MXU_INT8
        hbm_s = by / HBM_GBPS
        return {
            "floor_us": round(max(mxu_s, hbm_s) * 1e6, 2),
            "mxu_us": round(mxu_s * 1e6, 2),
            "hbm_us": round(hbm_s * 1e6, 2),
            "gflops": round((flops_bf16 + flops_int8) / 1e9, 3),
            "mbytes": round(by / 1e6, 3),
            "bound": "MXU" if mxu_s > hbm_s else "HBM",
            "layers": sorted(set(scopes))[:3],
        }

    rows = []
    for op in stats["ops"]:
        meas_us = op["self_ms_per_launch"] * 1000
        fl = floor_of(op["op"])
        row = {"op": op["op"], "category": op["category"],
               "measured_us": round(meas_us, 1)}
        if fl:
            row.update(fl)
            row["pct_of_floor"] = (round(fl["floor_us"] / meas_us * 100, 1)
                                   if meas_us > 0 else None)
            row["residual_us"] = round(meas_us - fl["floor_us"], 1)
        rows.append(row)

    conv_rows = [r for r in rows if r["category"] == "convolution fusion"
                 and "floor_us" in r]
    tot_meas = sum(r["measured_us"] for r in rows)
    conv_meas = sum(r["measured_us"] for r in conv_rows)
    conv_floor = sum(r["floor_us"] for r in conv_rows)
    return {
        "total_measured_ms": round(tot_meas / 1000, 3),
        "conv_measured_ms": round(conv_meas / 1000, 3),
        "conv_floor_ms": round(conv_floor / 1000, 3),
        "conv_pct_of_floor": round(conv_floor / conv_meas * 100, 1)
        if conv_meas else None,
        "ops": sorted(rows, key=lambda r: -r.get("residual_us",
                                                 r["measured_us"] * 0)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True,
                    help="profile dir with optimized_hlo.txt.gz + "
                         "hlo_stats_full.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    d = Path(args.dir)
    with gzip.open(d / "optimized_hlo.txt.gz", "rt") as f:
        hlo_text = f.read()
    stats = json.loads((d / "hlo_stats_full.json").read_text())

    result = attribute(hlo_text, stats)
    print(f"total measured: {result['total_measured_ms']} ms/launch; convs "
          f"{result['conv_measured_ms']} ms vs floor {result['conv_floor_ms']}"
          f" ms ({result['conv_pct_of_floor']}% of floor overall)")
    print(f"\n{'op':28} {'meas us':>8} {'floor':>8} {'%floor':>6} "
          f"{'bound':>5}  layers")
    for r in result["ops"][:args.top]:
        if "floor_us" not in r:
            print(f"{r['op'][:28]:28} {r['measured_us']:8.1f} "
                  f"{'—':>8} {'—':>6} {'—':>5}  [{r['category']}]")
            continue
        print(f"{r['op'][:28]:28} {r['measured_us']:8.1f} "
              f"{r['floor_us']:8.1f} {r['pct_of_floor'] or 0:6.1f} "
              f"{r['bound']:>5}  {'; '.join(r['layers'])[:70]}")

    out = Path(args.out or (d / "roofline_attrib.json"))
    out.write_text(json.dumps(result, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()

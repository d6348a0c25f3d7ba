"""Summarize an optimized decode-step HLO dump (bench.py --dump-hlo).

Reports, per opcode class: count and total bytes of operand+result
shapes — surfacing hidden full-cache copies, non-fused converts, and
the custom-call (Pallas kernel) census on the decode critical path.
"""
import argparse
import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "s16": 2, "u16": 2, "pred": 1,
               "f8e4m3fn": 1, "f8e5m2": 1, "s4": 0.5, "u4": 0.5,
               "s64": 8, "u64": 8, "f64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text):
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--min-mb", type=float, default=1.0,
                    help="list individual ops with result >= this many MB")
    args = ap.parse_args()

    counts = defaultdict(int)
    result_bytes = defaultdict(float)
    big_ops = []
    cur_computation = ""
    for line in open(args.path):
        line = line.strip()
        m = re.match(r"(%?\S+) \{", line)
        if line.startswith(("ENTRY", "%")) and "{" in line and "=" not in \
                line:
            cur_computation = line.split()[0]
        m = re.match(r"(\S+)\s*=\s*((?:\w+\[[^\]]*\]\{?[^\}]*\}?,?\s?)+)"
                     r"\s*(\w[\w-]*)\(", line)
        if not m:
            continue
        name, result_shape, opcode = m.groups()
        rb = shape_bytes(result_shape)
        key = opcode
        if opcode == "custom-call" and "tpu_custom_call" in line:
            km = re.search(r'kernel_name[^,}]*"([^"]+)"', line)
            key = f"pallas:{km.group(1)}" if km else "pallas"
        counts[key] += 1
        result_bytes[key] += rb
        if rb >= args.min_mb * 1e6 and opcode in (
                "copy", "convert", "transpose", "reshape", "bitcast",
                "dynamic-update-slice", "scatter", "gather", "concatenate",
                "broadcast", "add", "multiply", "select", "pad", "slice"):
            big_ops.append((rb, opcode, name, cur_computation))

    print(f"{'opcode':<44}{'count':>7}{'result GB':>12}")
    for k in sorted(result_bytes, key=lambda k: -result_bytes[k])[:args.top]:
        print(f"{k:<44}{counts[k]:>7}{result_bytes[k] / 1e9:>12.3f}")

    if big_ops:
        print(f"\nlarge data-movement ops (result >= {args.min_mb} MB):")
        for rb, opcode, name, comp in sorted(big_ops)[::-1][:40]:
            print(f"  {rb / 1e6:9.1f} MB  {opcode:<22} {name[:60]} "
                  f"in {comp[:40]}")


if __name__ == "__main__":
    main()

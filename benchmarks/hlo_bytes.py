"""Attribute a train step's HBM traffic to model components.

Compiles the production step (bench.py s2 path, or the s1 GPT step with
--gpt), walks the optimized HLO's entry computation, and charges each
top-level instruction its operands+output logical bytes — the same
traffic model XLA's cost_analysis uses ("bytes accessed").  Buckets the
totals by the JAX scope recorded in ``metadata op_name`` so the byte
hogs are named after model submodules instead of ``fusion.1234``.

Usage: python benchmarks/hlo_bytes.py [batch] [frames|sem_len] [out.txt] [--gpt]
"""
from __future__ import annotations

import re
import sys
from collections import defaultdict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
    "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1, "s4": 1, "u4": 1,
}

_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Logical bytes of every array shape mentioned in `text` (handles
    tuples by summing components)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^=]*?\)|\S+)\s+([\w\-]+)\((.*)$")
_OPND_RE = re.compile(r"%?([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def scope_of(op_name: str) -> str:
    """Collapse a JAX op_name path to a readable model scope."""
    parts = [p for p in op_name.split("/") if p]
    # drop jit(...)/transpose(...)/jvp(...) wrappers, keep module path
    keep = []
    for p in parts:
        if p.startswith(("jit(", "jvp(", "transpose(", "remat", "checkpoint",
                         "custom_vjp", "vmap(")):
            continue
        keep.append(p)
    if not keep:
        return op_name[:60]
    # first two module-ish components
    return "/".join(keep[:3])


def main():
    import jax

    sys.path.insert(0, ".")
    sys.path.insert(0, "benchmarks")

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch = int(pos[0]) if len(pos) > 0 else 8
    frames = int(pos[1]) if len(pos) > 1 else 256
    out_path = pos[2] if len(pos) > 2 else (
        "/tmp/gpt_hlo.txt" if "--gpt" in sys.argv else "/tmp/s2_hlo.txt")

    if "--parse-only" in sys.argv:
        txt = open(out_path).read()
    else:
        if "--gpt" in sys.argv:
            from profile_gpt import build as build_gpt
            state, data, step = build_gpt(batch, frames)
        else:
            from bench import build
            state, data, step = build(batch, frames)
        compiled = step.lower(state, data, jax.random.PRNGKey(0)).compile()
        txt = compiled.as_text()
        with open(out_path, "w") as f:
            f.write(txt)
        print(f"HLO written to {out_path} ({len(txt)/1e6:.1f} MB)")

    # split into computations
    comps: dict[str, list[str]] = {}
    cur = None
    entry = None
    for line in txt.splitlines():
        m = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->", line)
        if m and not line.startswith(" "):
            cur = m.group(2)
            comps[cur] = []
            if m.group(1):
                entry = cur
        elif cur is not None:
            comps[cur].append(line)

    if entry is None:
        print("no ENTRY computation found"); return

    # shapes by instruction name (entry computation)
    shapes: dict[str, str] = {}
    parsed = []
    for line in comps[entry]:
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape, opcode, rest = m.groups()
        shapes[name] = shape
        parsed.append((name, shape, opcode, rest, line))

    # parameters don't read anything; count operand bytes only for ops
    rows = []
    by_scope = defaultdict(int)
    by_opcode = defaultdict(int)
    for name, shape, opcode, rest, line in parsed:
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast", "copy-done", "after-all"):
            continue
        out_b = shape_bytes(shape)
        # operand names: first paren group until matching ')' — approximate by
        # scanning rest up to '), ' boundary
        arg_txt = rest.split("), ")[0]
        opnd_b = 0
        for opn in _OPND_RE.findall(arg_txt):
            if opn in shapes:
                opnd_b += shape_bytes(shapes[opn])
        total = out_b + opnd_b
        mo = _OPNAME_RE.search(line)
        scope = scope_of(mo.group(1)) if mo else f"<{opcode}>"
        rows.append((total, out_b, opnd_b, name, opcode, scope))
        by_scope[scope] += total
        by_opcode[opcode] += total

    rows.sort(reverse=True)
    grand = sum(r[0] for r in rows)
    print(f"\ntotal instruction bytes (operands+outputs): {grand/1e9:.2f} GB")

    print("\n== top 35 instructions ==")
    for total, out_b, opnd_b, name, opcode, scope in rows[:35]:
        print(f"{total/1e6:9.1f} MB  (out {out_b/1e6:7.1f} rd {opnd_b/1e6:8.1f})"
              f"  {opcode:12s} {name:18s} {scope}")

    print("\n== bytes by scope (top 40) ==")
    for scope, b in sorted(by_scope.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{b/1e9:8.3f} GB  {scope}")

    print("\n== bytes by opcode ==")
    for oc, b in sorted(by_opcode.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{b/1e9:8.3f} GB  {oc}")


if __name__ == "__main__":
    main()

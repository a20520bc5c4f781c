"""Memory accounting (_DBG_MEM_PROFILE_ analog, data_types.f90:545-557).

Reports per-field and total bytes of a state/grid pytree plus the fused
layout's footprint — the reference prints cumulative allocation totals;
here it is an on-demand report over live pytrees."""

from __future__ import annotations

import dataclasses

def field_bytes(tree) -> dict[str, int]:
    out = {}
    if dataclasses.is_dataclass(tree):
        for f in dataclasses.fields(tree):
            v = getattr(tree, f.name)
            if hasattr(v, "nbytes"):
                out[f.name] = int(v.nbytes)
    return out


def report(state=None, grid=None) -> str:
    lines = ["================== MEMORY REPORT =================="]
    total = 0
    for label, tree in (("state", state), ("grid", grid)):
        if tree is None:
            continue
        fb = field_bytes(tree)
        sub = sum(fb.values())
        total += sub
        lines.append(f"-- {label}: {sub / 1e6:.2f} MB over {len(fb)} fields")
        for k, v in sorted(fb.items(), key=lambda kv: -kv[1])[:8]:
            lines.append(f"   {k:<14} {v / 1e6:>9.3f} MB")
    lines.append(f"TOTAL {total / 1e6:.2f} MB "
                 f"({total / 2 ** 30:.3f} GiB)")
    lines.append("===================================================")
    return "\n".join(lines)

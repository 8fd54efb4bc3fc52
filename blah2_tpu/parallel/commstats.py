"""Collective-communication statistics from compiled XLA programs.

The multi-chip design's communication volume is validated *quantitatively*
without multi-chip hardware: the sharded pipeline compiles to an HLO module
whose collective ops (`collective-permute`, `all-reduce`, `reduce-scatter`,
`all-gather`, `all-to-all`) carry static shapes, so the bytes each rank
moves per step are known at compile time. `collect(fn, *args)` lowers a
function for the active device set and returns those ops with their
per-rank payload bytes; `tests/test_collective_bytes.py` pins them against
the analytic model of the design (SURVEY §2.5):

  - overlap-save halo exchange: (nb−1) complex64 samples per neighbour per
    CPI (`parallel/sharded.py::_segments_right_halo` and the FIR left halo),
    plus |delayMin| samples for the linear lag shift;
  - clutter spectrum reduction: nfft_seg complex64 per psum over the pulse
    axis;
  - Doppler map reduction: nd_rows_pad·n_delay complex64 psum — or 1/P of
    that per rank as a psum_scatter when row-sharded.

The reference has no analog (single-process, `src/blah2.cpp:137-139`); this
is the TPU framework's equivalent of auditing NCCL traffic, done statically.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Sequence

# HLO primitive byte widths.
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "c64": 8, "s64": 8, "u64": 8, "f64": 8,
    "c128": 16,
}

# `c64[5,40]{1,0}` or `f32[]` — a typed HLO shape token.
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

_COLLECTIVES = ("collective-permute", "all-reduce", "reduce-scatter",
                "all-gather", "all-to-all")


@dataclasses.dataclass
class CollectiveOp:
    kind: str            # e.g. "collective-permute"
    shapes: List[str]    # result shape tokens, e.g. ["c64[5,40]"]
    bytes_per_rank: int  # payload bytes one rank contributes per execution
    line: str            # the HLO line (diagnostics)


def _shape_bytes(token: str) -> int:
    m = _SHAPE_RE.match(token)
    if not m:
        return 0
    dtype, dims = m.groups()
    size = _DTYPE_BYTES.get(dtype)
    if size is None:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * size


def parse_hlo_collectives(hlo_text: str) -> List[CollectiveOp]:
    """Extract collective ops (incl. -start forms) from HLO module text."""
    ops: List[CollectiveOp] = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # `[ROOT ]%name = <shape(s)> <op>(...)`; async pairs appear as
        # `<op>-start` + `<op>-done` — count only the -start (or the
        # plain sync form). A collective that is a computation root is
        # prefixed `ROOT ` and must not be dropped.
        m = re.match(r"(?:ROOT\s+)?%?\S+\s*=\s*(\(?[^)=]*\)?)\s+([\w-]+)",
                     stripped)
        if not m:
            continue
        shapes_tok, opname = m.groups()
        base = opname.removesuffix("-start")
        if base not in _COLLECTIVES or opname.endswith("-done"):
            continue
        shape_tokens = _SHAPE_RE.findall(shapes_tok)
        shapes = [f"{d}[{dims}]" for d, dims in shape_tokens]
        if not shapes:
            continue
        if base == "collective-permute":
            # permute-start results repeat the payload as context/scratch
            # aliases — the true payload is the first result shape.
            nbytes = _shape_bytes(shapes[0])
        else:
            # all-reduce/all-gather/reduce-scatter may fuse several tensors
            # into one tuple-shaped op; every member is payload.
            nbytes = sum(_shape_bytes(s) for s in shapes)
        ops.append(CollectiveOp(base, shapes, nbytes, stripped))
    return ops


def summarize(ops: Sequence[CollectiveOp]) -> Dict[str, dict]:
    out: Dict[str, dict] = {}
    for op in ops:
        d = out.setdefault(op.kind, {"count": 0, "bytes_per_rank": 0,
                                     "shapes": []})
        d["count"] += 1
        d["bytes_per_rank"] += op.bytes_per_rank
        d["shapes"].append(op.shapes[0] if op.shapes else "?")
    return out


def collect(fn, *args, **kwargs) -> List[CollectiveOp]:
    """Lower+compile ``fn(*args)`` for the active devices and return its
    collective ops. ``fn`` may be a jitted function or a plain callable."""
    import jax

    if not hasattr(fn, "lower"):
        fn = jax.jit(fn)
    compiled = fn.lower(*args, **kwargs).compile()
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()]
    ops: List[CollectiveOp] = []
    for t in texts:
        ops.extend(parse_hlo_collectives(t))
    return ops

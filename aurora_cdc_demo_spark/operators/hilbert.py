"""Hilbert-curve clustering keys for multi-dimensional data layout.

The Z-order key (#104) interleaves bits, which preserves locality in
both dimensions but takes long diagonal jumps between quadrant
boundaries; the Hilbert curve removes those jumps (every consecutive
pair of keys is an adjacent cell), giving measurably tighter zone-map
min/max ranges per chunk — the reason real table formats offer
HILBERT alongside ZORDER for their OPTIMIZE clustering step. This
module re-expresses that choice for the landing-zone compaction sink.

Engine-friendly formulation: the textbook xy2d loop MUTATES (x, y)
with a rotation each level — unrolling it as nested SQL expressions
multiplies the expression tree ~4× per level and stalls Catalyst's
project-collapse exactly the way the 64-column pHash build did. But
the per-level rotation state of the Hilbert automaton is only FOUR
states ((swap, negate-both) — verified by closure from the initial
state), so the whole 8-level walk factors into TWO nibble steps
through a precomputed 1024-row lookup table: key = (state, x-nibble,
y-nibble) → (4 output digits, next state). Two broadcast joins to a
VALUES literal, zero expression blowup, exact integers end to end.
The table is data-independent (the JL-sign-matrix rule: constants are
computed in Python once, never per-row in-engine) and the SAME table
serves both nibble rounds (the automaton is level-homogeneous).

Cross-checked in pytest against the direct xy2d reference
implementation on the full 256×256 grid (bijectivity + equality).
"""

from __future__ import annotations

HILBERT_BITS = 8  # 256×256 grid → 16-bit key
_NIBBLE = 4  # levels per LUT step


def xy2d(n: int, x: int, y: int) -> int:
    """Reference Hilbert index (textbook xy2d; public domain
    algorithm). Used to BUILD the LUT and as the pytest oracle —
    never executed per-row in-engine."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _nibble_step(state: int, xn: int, yn: int) -> tuple[int, int]:
    """Run _NIBBLE automaton levels from ``state`` on one nibble
    pair. State encoding: swap*2 + negate (negate-x always equals
    negate-y on the reachable orbit — closure-verified)."""
    swap, neg = bool(state & 2), state & 1
    d = 0
    for k in range(_NIBBLE - 1, -1, -1):
        xx, yy = (yn, xn) if swap else (xn, yn)
        rx = ((xx >> k) & 1) ^ neg
        ry = ((yy >> k) & 1) ^ neg
        d = d * 4 + ((3 * rx) ^ ry)
        if ry == 0:
            swap, neg = (not swap), neg ^ rx
    return d, (2 if swap else 0) | neg


def hilbert_lut_rows() -> list[tuple[int, int, int]]:
    """(state*256 + xn*16 + yn, d_nibble, next_state) for all 4
    states × 16 × 16 nibble pairs — 1024 rows."""
    rows = []
    for state in range(4):
        for xn in range(16):
            for yn in range(16):
                d, nxt = _nibble_step(state, xn, yn)
                rows.append((state * 256 + xn * 16 + yn, d, nxt))
    return rows


def hilbert_lut_values(alias: str) -> str:
    """The LUT as a dual-dialect VALUES literal ``alias(k, d, st)``."""
    rows = ", ".join(f"({k}, {d}, {s})" for k, d, s in hilbert_lut_rows())
    return f"(VALUES {rows}) {alias}(k, d, st)"


def hilbert_key_sql(dialect: str, x8: str, y8: str, src: str) -> str:
    """SELECT computing hkey for each row of ``src`` (which must
    expose nonnegative 8-bit ``{x8}``/``{y8}``): high-nibble LUT
    step from state 0, then low-nibble step from the resulting
    state. Both joins broadcast a 1024-row literal; no shuffle, no
    expression growth."""
    div = "div" if dialect == "spark" else "//"
    return f"""
        SELECT b.*, CAST(h1.d * 256 + h2.d AS BIGINT) AS hkey
        FROM (SELECT *, {x8} AS hx8, {y8} AS hy8 FROM {src}) b
        JOIN {hilbert_lut_values('h1')}
          ON h1.k = (hx8 {div} 16) * 16 + (hy8 {div} 16)
        JOIN {hilbert_lut_values('h2')}
          ON h2.k = h1.st * 256 + (hx8 % 16) * 16 + (hy8 % 16)
    """

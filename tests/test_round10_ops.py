"""Round-10 operator invariants beyond the driver's hash check."""

from __future__ import annotations

from bigdatawork_spark.registry import QUERIES


def test_zorder_tiles_bound_both_dimensions(spark, sf_dir):
    """The quadtree property that makes z-order layout useful: a top-4-bit
    z-prefix tile fixes the top 2 bits of BOTH 12-bit dimensions, so every
    tile's per-dimension span is <= 1024 (one quadrant) — this is what
    guarantees file-stat pruning works for predicates on either column."""
    rows = QUERIES["layout_zorder_stats"](spark, sf_dir).collect()
    assert rows, "vacuous: no tiles"
    for r in rows:
        assert 0 <= r.tile <= 15
        assert r.x_max - r.x_min <= 1023, r
        assert r.y_max - r.y_min <= 1023, r
        # and the quadrant is the RIGHT one: the tile's 4 bits are
        # (y11, x11, y10, x10) — recompute from the mins
        tile_bits = (
            ((r.x_min >> 10) & 1)
            | (((r.y_min >> 10) & 1) << 1)
            | (((r.x_min >> 11) & 1) << 2)
            | (((r.y_min >> 11) & 1) << 3)
        )
        assert tile_bits == r.tile, r

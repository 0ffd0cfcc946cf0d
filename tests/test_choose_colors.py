"""chooseColors analog: priority-class flank color selection
(correct/choose.py vs Correction.cpp:215-429, 476-585)."""

import numpy as np

from ratatosk_tpu.correct.choose import (FLANK_COV, branching_mask,
                                         choose_region_colors)
from ratatosk_tpu.correct.seeds import SolidRun
from ratatosk_tpu.graph.colors import GraphColors
from ratatosk_tpu.ops import colorset as CS


def _colors(rows_ids, cap=16):
    rows, card = CS.make_rows(rows_ids, cap)
    n = len(rows_ids)
    return GraphColors(cap=cap, rows=rows, card=card,
                       coverage=np.ones(n, np.int64),
                       edge_support=np.zeros((n, 2, 4), bool),
                       n_colors=64)


def _run(s, e, uid):
    return SolidRun(s=s, e=e, uid=uid, direction=0, o_s=0)


def test_branching_mask():
    es = np.zeros((3, 2, 4), bool)
    es[1, 0, 0] = es[1, 0, 1] = True     # 2 supported successors
    es[2, 1, 2] = True                   # 1 supported predecessor
    b = branching_mask(es)
    assert list(b) == [False, True, False]


def test_priority_classes_order():
    # unitigs: 0 = left anchor, 1 = right anchor, 2 = left flank,
    # 3 = right flank, 4 = far unrelated
    colors = _colors([
        [1, 2],          # anchor L
        [3, 4],          # anchor R
        [10, 11, 30],    # flank L (30 also on the right -> class "both")
        [20, 21, 30],    # flank R
        [40, 41],
    ])
    branching = np.zeros(5, bool)
    runs = [_run(0, 10, 2), _run(100, 150, 0), _run(300, 350, 1),
            _run(480, 500, 3)]
    row, wts = choose_region_colors(runs, 1, 2, 200, 280, colors, branching,
                                    insert_sz=500, cap=16)
    ids = set(row[row != CS.PAD].tolist())
    # anchors + both-side + one-side flanks all fit under the cap
    assert {1, 2, 3, 4, 30, 10, 11, 20, 21} == ids
    # weights: everything is non-branching here -> weighted uniformly
    assert (wts[row != CS.PAD] >= 1).all()


def test_cap_prioritizes_anchors_and_both_side():
    colors = _colors([
        list(range(0, 6)),        # anchor L
        list(range(6, 12)),       # anchor R
        [50, 51, 52, 60, 61],     # flank L
        [50, 51, 52, 70, 71],     # flank R (50-52 shared -> class both)
    ])
    branching = np.zeros(4, bool)
    runs = [_run(0, 10, 2), _run(100, 150, 0), _run(300, 350, 1),
            _run(480, 500, 3)]
    row, wts = choose_region_colors(runs, 1, 2, 200, 280, colors, branching,
                                    insert_sz=500, cap=15)
    ids = set(row[row != CS.PAD].tolist())
    assert set(range(0, 12)) <= ids          # in-region anchors always in
    assert {50, 51, 52} <= ids               # both-side class beats one-side
    assert len(ids) == 15                    # filled to cap


def test_branching_flank_is_lowest_class_and_unweighted():
    colors = _colors([
        [1],            # anchor L
        [2],            # anchor R
        [10, 11],       # flank L non-branching
        [20, 21],       # flank R BRANCHING
    ])
    branching = np.array([False, False, False, True])
    runs = [_run(100, 150, 0), _run(300, 350, 1)]
    runs = [_run(0, 10, 2)] + runs + [_run(480, 500, 3)]
    row, wts = choose_region_colors(runs, 1, 2, 200, 280, colors, branching,
                                    insert_sz=500, cap=16)
    by_id = dict(zip(row.tolist(), wts.tolist()))
    assert by_id[10] > by_id[20]    # non-branching reads weighted higher
    assert by_id[20] == 1


def test_insert_sz_bounds_flank_collection():
    colors = _colors([[1], [2], [10], [20]])
    branching = np.zeros(4, bool)
    # flank runs sit 600bp from the region: outside insert_sz=500
    runs = [_run(0, 10, 2), _run(700, 750, 0), _run(900, 950, 1),
            _run(1600, 1650, 3)]
    row, _ = choose_region_colors(runs, 1, 2, 800, 880, colors, branching,
                                  insert_sz=500, cap=16)
    ids = set(row[row != CS.PAD].tolist())
    assert ids == {1, 2}            # only the in-region anchors


def test_flank_cov_cap_per_unitig():
    colors = _colors([[1], [2], list(range(100, 100 + FLANK_COV + 20))],
                     cap=64)
    branching = np.zeros(3, bool)
    runs = [_run(0, 50, 2), _run(100, 150, 0), _run(300, 350, 1)]
    row, _ = choose_region_colors(runs, 1, 2, 200, 280, colors, branching,
                                  insert_sz=500, cap=64)
    ids = row[row != CS.PAD]
    flank_ids = ids[ids >= 100]
    assert len(flank_ids) <= FLANK_COV

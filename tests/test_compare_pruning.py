"""graphs_isomorphic must stay fast on NON-isomorphic graphs whose
bnodes are refinement-equivalent: the backtracker consumes each triple
as its last bnode is assigned (incremental validation), so inconsistent
partial bijections die at the first broken triple instead of being
enumerated to completion — leaf-only validation was measured factorial
(38 s at 10 bnodes, timeout at 12) on exactly the failing-comparison
case where a diff is most needed."""

import time

from raptor_spark.kernel.compare import find_bnode_mapping, graphs_isomorphic
from raptor_spark.kernel.terms import Triple


def _cycle(labels):
    n = len(labels)
    return [
        Triple("_:" + labels[i], "http://p", 4, labels[(i + 1) % n],
               None, None, None)
        for i in range(n)
    ]


def test_wl_equivalent_nonisomorphic_fast():
    # one 2k-cycle vs two k-cycles: identical 3-round refinement
    # signatures, NOT isomorphic
    for k in (5, 7, 10):
        a = _cycle([f"a{i}" for i in range(2 * k)])
        b = _cycle([f"b{i}" for i in range(k)]) + _cycle(
            [f"c{i}" for i in range(k)]
        )
        t0 = time.time()
        assert graphs_isomorphic(a, b) is False
        assert time.time() - t0 < 5


def test_relabel_cycle_still_isomorphic():
    a = _cycle([f"a{i}" for i in range(10)])
    c = _cycle([f"z{(i * 3) % 10}" for i in range(10)])
    m = find_bnode_mapping(a, c)
    assert m is not None and len(m) == 10

import numpy as np

from recom_tpu.ir.intervals import INT_MAX, INT_MIN, IntervalSet, compare_to_interval


def test_normalize_and_merge():
    s = IntervalSet([(5, 10), (0, 3), (4, 4)])
    assert s.intervals == ((0, 10),)
    assert IntervalSet([(3, 1)]).is_empty()


def test_union_intersect():
    a = IntervalSet([(0, 10)])
    b = IntervalSet([(5, 20)])
    assert a.union(b) == IntervalSet([(0, 20)])
    assert a.intersect(b) == IntervalSet([(5, 10)])
    assert a.intersect(IntervalSet([(11, 12)])).is_empty()


def test_complement_difference():
    a = IntervalSet([(0, 10)])
    c = a.complement()
    assert c == IntervalSet([(INT_MIN, -1), (11, INT_MAX)])
    assert c.complement() == a
    assert a.difference(IntervalSet([(3, 5)])) == IntervalSet([(0, 2), (6, 10)])


def test_predicates():
    a = IntervalSet([(0, 10), (20, 30)])
    assert a.contains(0) and a.contains(25) and not a.contains(15)
    assert a.is_superset(IntervalSet([(2, 4), (22, 23)]))
    assert not a.is_superset(IntervalSet([(9, 12)]))
    assert IntervalSet.all().is_all()
    assert a.min() == 0 and a.max() == 30


def test_membership_mask():
    a = IntervalSet([(0, 3), (10, 12)])
    x = np.array([-1, 0, 3, 4, 10, 12, 13])
    np.testing.assert_array_equal(
        a.membership_mask(x),
        [False, True, True, False, True, True, False],
    )


def test_compare_to_interval():
    assert compare_to_interval(">", 5) == IntervalSet([(6, INT_MAX)])
    assert compare_to_interval(">=", 5) == IntervalSet([(5, INT_MAX)])
    assert compare_to_interval("<", 5) == IntervalSet([(INT_MIN, 4)])
    assert compare_to_interval("==", 5) == IntervalSet.point(5)
    ne = compare_to_interval("!=", 5)
    assert not ne.contains(5) and ne.contains(4) and ne.contains(6)


def test_boundaries_roundtrip():
    a = IntervalSet([(0, 3), (10, 12)])
    left, right = a.boundaries()
    assert left == [0, 10] and right == [3, 12]

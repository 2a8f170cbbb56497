"""tools/oracle_check.canon: dtype-strict, list order contractual by
default, order-insensitive comparison opt-in per column (round-3 ADVICE)."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")
from tools.oracle_check import canon  # noqa: E402


def test_canon_preserves_list_order_by_default():
    a = pd.DataFrame({"xs": [[1, 2, 3]]})
    b = pd.DataFrame({"xs": [[3, 2, 1]]})
    assert not canon(a).equals(canon(b))  # contractual ordering respected


def test_canon_optin_unordered_column():
    a = pd.DataFrame({"xs": [[1, 2, 3]], "k": [1]})
    b = pd.DataFrame({"xs": [[3, 2, 1]], "k": [1]})
    assert canon(a, {"xs"}).equals(canon(b, {"xs"}))
    assert canon(a, True).equals(canon(b, True))
    # opting in one column must not loosen the others
    c = pd.DataFrame({"xs": [[1, 2, 3]], "k": [2]})
    assert not canon(a, {"xs"}).equals(canon(c, {"xs"}))


def test_canon_dtype_strict():
    ints = pd.DataFrame({"v": pd.Series([99111], dtype="int64")})
    floats = pd.DataFrame({"v": pd.Series([99111.0], dtype="float64")})
    assert not canon(ints).equals(canon(floats))  # int64 != float64 repr


def test_canon_nested_list_order():
    a = pd.DataFrame({"xs": [[[1, 2], [3, 4]]]})
    b = pd.DataFrame({"xs": [[[2, 1], [4, 3]]]})
    assert not canon(a).equals(canon(b))
    assert canon(a, {"xs"}).equals(canon(b, {"xs"}))

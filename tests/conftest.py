import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ticdc_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ticdc-tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table_path(tmp_path):
    return str(tmp_path / "lake_table")


def assert_df_equal(got, want, key_cols):
    """Order-insensitive DataFrame equality with readable diffs."""
    gcols = sorted(got.columns)
    wcols = sorted(want.columns)
    assert gcols == wcols, f"columns differ: {gcols} vs {wcols}"
    def keyf(t):
        return tuple((x is None, str(x)) for x in t)

    g = sorted([tuple(r) for r in got.select(*gcols).collect()], key=keyf)
    w = sorted([tuple(r) for r in want.select(*wcols).collect()], key=keyf)
    assert len(g) == len(w), f"row counts differ: {len(g)} vs {len(w)}\nonly-got={set(g)-set(w)}\nonly-want={set(w)-set(g)}"
    for i, (a, b) in enumerate(zip(g, w)):
        assert a == b, f"row {i} differs:\n got={a}\nwant={b}"

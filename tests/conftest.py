import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

REFERENCE_PATH = "/root/reference"


def _has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "pawpaw"))


@pytest.fixture(scope="session")
def pawpaw_ref():
    """The reference implementation, imported in-process as the oracle."""
    if not _has_reference():
        pytest.skip("reference pawpaw not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import pawpaw  # noqa: F401

    return pawpaw


@pytest.fixture(scope="session")
def spark():
    from pawpaw_spark.session import get_spark

    s = get_spark(app_name="pawpaw_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def oracle_tree_tuples(itos, parent_span=None):
    """Flatten pawpaw Ito trees to {(start, stop, desc, parent_span)}."""
    out = set()
    for ito in itos:
        out.add((ito.start, ito.stop, ito.desc, parent_span))
        out |= oracle_tree_tuples(ito.children, (ito.start, ito.stop))
    return out


def kernel_tuples(segs):
    """Flatten kernel SegRecords to the same tuple form (root excluded;
    segments whose parent is the root get parent_span=None)."""
    out = set()
    for seg_id, (start, stop, desc, parent_idx, depth, tag) in enumerate(segs):
        if seg_id == 0:
            continue
        if parent_idx == 0:
            ps = None
        else:
            p = segs[parent_idx]
            ps = (p[0], p[1])
        out.add((start, stop, desc, ps))
    return out

"""CI twin of the degenerate-input probes (tools/empty_probe.py,
tools/null_probe.py) over just the ENTRY-LEVEL wiring they caught.

The operator-level contracts those probes forced (kmeans empty model,
IVF schema sidecar, budget_select null exclusion, GEMM ragged blocks)
are pinned in their own test modules; what only the probes exercised is
the DRIVER-QUERY wiring — _query_vec's fallback, crud_query's empty
slice, the bucketed table-name sanitization, ensure_* on an empty
source. This module re-runs exactly the queries that crashed, against
a zero-row scratch dir and a null-poisoned scratch dir, so a
regression fails CI instead of waiting for the next manual probe run.
The full-surface sweeps stay in the tools (run per round, artifacts
EMPTYCHECK/NULLCHECK.json).
"""

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the nine empty-probe crashers + the four null-probe crashers
EMPTY_CRASHERS = ["kmeans_cells", "ann_recall", "ann_ivf", "ann_quantized",
                  "semantic_dedup", "topk_cosine", "crud_query",
                  "bucketed_join_revenue", "topk_small_collection"]
NULL_CRASHERS = ["token_budget", "kmeans_cells", "semantic_dedup",
                 "dedup_cosine"]


def _fixed_scratch(name, build):
    # Deterministic path, same reasoning as the probe tools: random names
    # would mint new fingerprinted warehouse artifacts (bucketed tables,
    # IVF indexes) every CI run.
    scratch = os.path.join(tempfile.gettempdir(), name)
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    build(scratch)
    return scratch


@pytest.fixture(scope="module")
def empty_dir():
    import tools.empty_probe as ep
    scratch = _fixed_scratch("gsed-empty-ci", ep._synthesize_empty)
    yield scratch
    shutil.rmtree(scratch, ignore_errors=True)


@pytest.fixture(scope="module")
def null_dir():
    import tools.null_probe as np_
    scratch = _fixed_scratch("gsed_null_ci", np_._poison)
    yield scratch
    shutil.rmtree(scratch, ignore_errors=True)


@pytest.mark.parametrize("name", EMPTY_CRASHERS)
def test_entry_query_survives_empty_tables(spark, empty_dir, name):
    import __spark_entry__ as em
    em.queries()[name](spark, empty_dir).count()  # no exception is the pass


@pytest.mark.parametrize("name", NULL_CRASHERS)
def test_entry_query_survives_null_rows(spark, null_dir, name):
    import __spark_entry__ as em
    em.queries()[name](spark, null_dir).count()

"""Build planning scales: parquet footer reads fan out through Ray past
PLAN_PARALLEL_MIN_FILES instead of a serial driver loop (at the 10^6-file
design point a serial `pq.read_metadata` loop alone would take days)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import meresco_lucene_ray.index.build as build_mod
from meresco_lucene_ray.index import IndexConfig, build_index
from meresco_lucene_ray.index.build import _plan_file_units
from meresco_lucene_ray.query import IndexSearcher, MatchAllQ


@pytest.fixture(scope="module")
def many_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("manyfiles")
    paths = []
    rng = np.random.default_rng(7)
    for i in range(80):  # >= PLAN_PARALLEL_MIN_FILES (64)
        n = int(rng.integers(3, 9))
        t = pa.table(
            {
                "__id__": [f"f{i}_r{j}" for j in range(n)],
                "text": [f"token{i} common word{j}" for j in range(n)],
            }
        )
        p = str(d / f"part-{i:04d}.parquet")
        pq.write_table(t, p, row_group_size=4)
        paths.append(p)
    return paths


def test_parallel_plan_matches_serial(ray_session, many_files):
    serial = {p: build_mod._footer_rg_rows(p) for p in many_files}

    def assemble(rg_by_path):
        return rg_by_path

    # force the serial path for the golden plan
    units_serial = None
    orig = build_mod.PLAN_PARALLEL_MIN_FILES
    try:
        build_mod.PLAN_PARALLEL_MIN_FILES = 10**9
        units_serial = _plan_file_units(many_files, target_docs=10)
        build_mod.PLAN_PARALLEL_MIN_FILES = 1
        units_parallel = _plan_file_units(many_files, target_docs=10)
    finally:
        build_mod.PLAN_PARALLEL_MIN_FILES = orig
    assert units_parallel == units_serial
    assert sum(u["rows"] for u in units_parallel) == sum(len(v) and sum(v) for v in serial.values())


def test_no_driver_footer_loop_on_many_files(ray_session, many_files, tmp_path, monkeypatch):
    # the driver-side footer reader must NOT run for an 80-file corpus: the
    # reads happen inside Ray tasks.  The spy list is driver-process-local —
    # Ray ships workers a by-value COPY of the patched function (with its own
    # list), so any append visible here was a serial driver read.
    driver_calls: list = []
    real = build_mod._footer_rg_rows

    def _spy(path):
        driver_calls.append(path)
        return real(path)

    monkeypatch.setattr(build_mod, "_footer_rg_rows", _spy)
    units = _plan_file_units(many_files, target_docs=10)
    assert driver_calls == []  # zero serial driver metadata reads
    assert len(units) >= 80
    assert [u["shard"] for u in units] == list(range(len(units)))

    # and the full build works end-to-end with distributed planning
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(text_col="text", id_col="__id__")
    build_index(many_files, idx, cfg, target_docs_per_segment=10)
    s = IndexSearcher(idx, num_actors=2, num_cpus=0.25)
    total = sum(pq.read_metadata(p).num_rows for p in many_files)
    assert s.count(MatchAllQ()) == total

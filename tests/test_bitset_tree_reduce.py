"""keys_of_dataset tree-reduce: with many small blocks the driver must fold
only O(fanin) partial payloads (merged in task rounds), never one per block —
and the resulting bitset must be identical to the naive union.

Mirrors the last_dedup_driver_rows pin pattern (test_dedup_distributed)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from meresco_lucene_ray.join.bitsets import KeyBits, bitset_from_keys, keys_of_dataset


def _many_block_ds(n_blocks: int, keys_per_block: int, size: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    tables, all_keys = [], []
    for _ in range(n_blocks):
        k = rng.integers(-2, size + 2, size=keys_per_block)  # incl. out-of-range
        all_keys.append(k)
        tables.append(pa.table({"key": pa.array(k, type=pa.int64())}))
    return rd.from_arrow(tables), np.concatenate(all_keys)


def test_tree_reduce_matches_naive_and_pins_driver_payloads(ray_session):
    size = 512
    ds, all_keys = _many_block_ds(n_blocks=120, keys_per_block=40, size=size)
    assert ds.num_blocks() >= 100

    bits = keys_of_dataset(ds, "key", size, fanin=8)
    expected = bitset_from_keys(all_keys, size)
    assert np.array_equal(bits.materialize(), expected)

    # the driver folded at most `fanin` payloads, after >=2 task rounds
    # (120 blocks -> 15 -> 2 at fanin=8)
    assert keys_of_dataset.last_driver_payloads <= 8
    assert keys_of_dataset.last_merge_rounds >= 2


def test_tree_reduce_sparse_only_stays_sparse_and_correct(ray_session):
    # a HUGE key space with few keys: every partial and every merged partial
    # must stay sparse (dense would be 8 MB/payload), and the result exact
    size = 64_000_000
    tables = [
        pa.table({"key": pa.array([i * 1000, i * 1000 + 7], type=pa.int64())})
        for i in range(40)
    ]
    ds = rd.from_arrow(tables)
    bits = keys_of_dataset(ds, "key", size, fanin=4)
    got = np.flatnonzero(bits.materialize())
    want = np.unique([i * 1000 for i in range(40)] + [i * 1000 + 7 for i in range(40)])
    assert np.array_equal(got, want)
    assert keys_of_dataset.last_driver_payloads <= 4


def test_small_inputs_skip_task_rounds(ray_session):
    size = 256
    ds, all_keys = _many_block_ds(n_blocks=3, keys_per_block=20, size=size)
    bits = keys_of_dataset(ds, "key", size)  # default fanin=64 > 3 blocks
    assert np.array_equal(bits.materialize(), bitset_from_keys(all_keys, size))
    assert keys_of_dataset.last_merge_rounds == 0


def test_algebra_on_tree_reduced_bits(ray_session):
    size = 128
    ds_a, keys_a = _many_block_ds(20, 10, size, seed=1)
    ds_b, keys_b = _many_block_ds(20, 10, size, seed=2)
    a = keys_of_dataset(ds_a, "key", size, fanin=4)
    b = keys_of_dataset(ds_b, "key", size, fanin=4)
    assert np.array_equal(
        (a | b).materialize(),
        bitset_from_keys(keys_a, size) | bitset_from_keys(keys_b, size),
    )
    assert np.array_equal(
        (a & ~b).materialize(),
        bitset_from_keys(keys_a, size) & ~bitset_from_keys(keys_b, size),
    )

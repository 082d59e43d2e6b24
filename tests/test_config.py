"""Knob-derivation tests: partition counts must SCALE with input size
(VERDICT r3 #1 — a hard-coded 16 under groupby.map_groups is a silent
OOM at 100x scale), and prebuilt-index actors must reject contradicting
kwargs (ADVICE r3 #1)."""

from __future__ import annotations

import numpy as np
import pytest

from locus_ray.config import num_partitions_for
from locus_ray.stages import pip


def test_num_partitions_sandbox_default_unchanged():
    # gate-scale inputs keep the former hard-coded default (16) so
    # small-cluster plans are unchanged
    assert num_partitions_for(500) == 16
    assert num_partitions_for(60_000) == 16


def test_num_partitions_scales_linearly_with_input():
    # the 4x-input smoke: partition count grows 4x once above the floor
    base = num_partitions_for(100_000_000)  # 500 at 200k rows/partition
    quad = num_partitions_for(4 * 100_000_000)
    assert base == 500
    assert quad == 4 * base
    # per-operator memory knob: smaller rows_per_partition -> more parts
    assert num_partitions_for(100_000_000, rows_per_partition=50_000) == 4 * base


def test_num_partitions_capped():
    assert num_partitions_for(10**12) == 1 << 16


def test_pip_prebuilt_index_rejects_mismatched_kwargs():
    idx = pip.PipIndex(pip.polygon_payload(np.arange(3, dtype=np.int64)), res=8)
    with pytest.raises(ValueError, match="res"):
        pip.PipJoinActor(idx, res=6)
    with pytest.raises(ValueError, match="exact"):
        pip.PipJoinActor(idx, exact=True)
    # matching or omitted kwargs are accepted
    pip.PipJoinActor(idx, res=8)
    pip.PipJoinActor(idx)

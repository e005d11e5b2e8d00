"""Unit tests for the async CLI batch dispatcher (pipeline/infer.BatchRunner).

Regression coverage for two host-path bugs found in review:
- per-instance 'pipeline' time must cover dispatch+fetch ONLY (prep and
  decode wall are recorded separately as times['prep']; counting them here
  double-reports them in the BOP CSV time sums, reference semantics:
  scripts/infer.py:636-645);
- padded tail instances must be sliced away and results must preserve
  push order across batch boundaries.
"""

import time
from typing import NamedTuple

import numpy as np
import pytest

from foundpose_tpu.pipeline.infer import BatchRunner, PendingInstance


class _Out(NamedTuple):
    # Matches the attribute surface _unpack_result reads.
    success: np.ndarray
    R_m2w: np.ndarray
    t_m2w: np.ndarray
    R_m2c: np.ndarray
    t_m2c: np.ndarray
    quality: np.ndarray
    score: np.ndarray
    best_template: np.ndarray
    num_queries: np.ndarray
    template_ids: np.ndarray
    best_corresp_2d: np.ndarray
    best_corresp_2d_ids: np.ndarray
    best_corresp_3d: np.ndarray
    best_corresp_conf: np.ndarray
    best_corresp_valid: np.ndarray


def _fake_out(tags):
    n = len(tags)
    eye = np.broadcast_to(np.eye(3), (n, 3, 3))
    z3 = np.zeros((n, 3))
    return _Out(
        success=np.ones(n, bool),
        R_m2w=eye, t_m2w=z3, R_m2c=eye, t_m2c=z3,
        quality=np.asarray(tags, np.float32),  # carries identity for checks
        score=np.zeros(n, np.float32),
        best_template=np.zeros(n, np.int32),
        num_queries=np.zeros(n, np.float32),
        template_ids=np.zeros((n, 5), np.int32),
        best_corresp_2d=np.zeros((n, 4, 2), np.float32),
        best_corresp_2d_ids=np.zeros((n, 4), np.int32),
        best_corresp_3d=np.zeros((n, 4, 3), np.float32),
        best_corresp_conf=np.zeros((n, 4), np.float32),
        best_corresp_valid=np.zeros((n, 4), np.float32),
    )


def _pending(tag):
    return PendingInstance(
        scene_id=0, im_id=0, inst_id=tag, obj_id=1,
        det_score=1.0, det_time=0.0,
        crop_image=np.zeros((4, 4, 3), np.uint8),
        crop_mask=np.zeros((4, 4), np.uint8),
        crop_camera=None, orig_camera=None, gt=None,
        times={"prep": 0.0},
    )


def test_order_padding_and_remainder():
    """11 instances through batch-4: padded tails sliced, order preserved."""
    seen_batches = []

    def dispatch_one(seq, padded):
        seen_batches.append([p.inst_id for p in padded])
        return _fake_out([p.inst_id for p in padded])

    runner = BatchRunner(4, dispatch_one)
    pend = [_pending(i) for i in range(11)]
    for p in pend:
        runner.push([p])
    results = runner.results()

    assert len(results) == 11  # padded duplicates sliced away
    assert [p.inst_id for p, _ in results] == list(range(11))
    # Each result row came from its own instance's lane.
    assert [int(r["quality"]) for _, r in results] == list(range(11))
    # Remainder batch was padded to the full batch size.
    assert all(len(b) == 4 for b in seen_batches)
    assert seen_batches[-1] == [8, 9, 10, 10]


def test_pipeline_time_excludes_host_prep():
    """The 'pipeline' time distributes dispatch+fetch wall only: host-side
    decode/prep time between pushes must NOT inflate it (it is reported
    separately as times['prep'])."""
    runner = BatchRunner(2, lambda seq, padded: _fake_out(
        [p.inst_id for p in padded]))
    runner.push([_pending(0), _pending(1)])
    time.sleep(0.25)  # simulated image decode / prep between batches
    runner.push([_pending(2), _pending(3)])
    results = runner.results()

    total_pipeline = sum(p.times["pipeline"] for p, _ in results)
    # dispatch_one + fetch are near-instant here; the 0.25 s host sleep must
    # not leak into the reported pipeline wall.
    assert total_pipeline < 0.2, total_pipeline


def test_max_in_flight_bounds_unfetched_batches():
    in_flight_high_water = []

    def dispatch_one(seq, padded):
        return _fake_out([p.inst_id for p in padded])

    runner = BatchRunner(1, dispatch_one, max_in_flight=2)
    for i in range(8):
        runner.push([_pending(i)])
        in_flight_high_water.append(len(runner._in_flight))
    assert max(in_flight_high_water) <= 2
    assert len(runner.results()) == 8


def test_prefetch_worker_stops_when_generator_abandoned():
    """Abandoning _iter_samples_prefetched (consumer exception / early break)
    must stop the loader thread instead of leaving it blocked on q.put
    holding decoded images (review finding, round 3)."""
    from foundpose_tpu.pipeline.infer import _iter_samples_prefetched

    loads = []

    def load_fn(scene_id, im_id):
        loads.append((scene_id, im_id))
        return np.zeros((4, 4, 3), np.uint8)

    keys = [(0, i) for i in range(100)]
    gen = _iter_samples_prefetched(keys, load_fn, depth=2)
    next(gen)
    gen.close()  # GeneratorExit -> finally -> stop flag
    # The worker exits at its next bounded put (<=0.2 s); afterwards no
    # further loads may happen.
    time.sleep(0.5)
    n = len(loads)
    time.sleep(0.5)
    assert len(loads) == n, "loader thread kept running after abandonment"
    # And it stopped far short of draining all 100 keys.
    assert n <= 6, n


def test_prefetch_loader_exception_reraises_in_consumer():
    from foundpose_tpu.pipeline.infer import _iter_samples_prefetched

    def load_fn(scene_id, im_id):
        if im_id == 1:
            raise RuntimeError("corrupt image")
        return im_id

    gen = _iter_samples_prefetched([(0, 0), (0, 1), (0, 2)], load_fn, depth=1)
    assert next(gen)[1] == 0
    with pytest.raises(RuntimeError, match="corrupt image"):
        list(gen)

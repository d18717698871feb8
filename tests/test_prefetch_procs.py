"""PrefetchLoader process-worker mode (data/prefetch.py use_processes=True).

The reference decodes video in torch DataLoader worker PROCESSES
(train_sft.sh dataloader workers); the thread pool is the 1-core-host
default and this is the multi-core pod equivalent: forked workers inherit
the make_batch closure (never pickled), indices go over an mp.Queue,
numpy results come back pickled. Ordering, backpressure, error
propagation, and a real cv2-decode smoke are pinned here.
"""

import time

import numpy as np
import pytest

from video_r2_tpu.data.prefetch import PrefetchLoader, WorkerError


def test_process_mode_ordered_results():
    data = {i: np.full((4,), i, np.int32) for i in range(12)}

    def make(idx):
        i = idx[0]
        time.sleep(0.01 * (i % 3))  # jitter completion order
        return data[i]

    loader = PrefetchLoader(([i] for i in range(12)), make,
                            num_workers=3, prefetch=2, use_processes=True)
    try:
        out = list(loader)
    finally:
        loader.close()
    assert len(out) == 12
    for i, arr in enumerate(out):
        np.testing.assert_array_equal(arr, data[i])


def test_process_mode_closure_state_inherited():
    """The forked workers see the closure's captured state without any
    pickling of the callable (fork inheritance — a lambda over local state
    would fail ProcessPoolExecutor-style pickling)."""
    captured = {"base": 100}
    loader = PrefetchLoader(([i] for i in range(5)),
                            lambda idx: captured["base"] + idx[0],
                            num_workers=2, use_processes=True)
    try:
        assert list(loader) == [100, 101, 102, 103, 104]
    finally:
        loader.close()


def test_process_mode_error_propagates():
    def make(idx):
        if idx[0] == 3:
            raise ValueError("boom on 3")
        return idx[0]

    loader = PrefetchLoader(([i] for i in range(6)), make,
                            num_workers=2, use_processes=True)
    got, err = [], None
    try:
        try:
            for x in loader:
                got.append(x)
        except WorkerError as e:
            err = e
    finally:
        loader.close()
    assert err is not None and "boom on 3" in str(err)
    assert got == [0, 1, 2]


def test_process_mode_backpressure():
    """Submitted jobs stay bounded by prefetch + num_workers: with a slow
    consumer the workers cannot run away and buffer the whole dataset."""
    done = []

    def make(idx):
        return idx[0]

    loader = PrefetchLoader(([i] for i in range(50)), make,
                            num_workers=2, prefetch=2, use_processes=True)
    try:
        it = iter(loader)
        done.append(next(it))
        time.sleep(0.5)  # let workers run as far ahead as they are allowed
        with loader._cv:
            buffered = len(loader._pending)
        # window = prefetch (2) + num_workers (2); allow +1 for in-flight
        assert buffered <= 5, buffered
        rest = list(it)
    finally:
        loader.close()
    assert done + rest == list(range(50))


def test_process_mode_worker_death_raises():
    """A worker killed mid-job (segfault/OOM-kill analog: SIGKILL) must
    surface as WorkerError instead of hanging the consumer forever on the
    lost seq (torch DataLoader's 'worker exited unexpectedly' behavior)."""
    import os
    import signal

    def make(idx):
        if idx[0] == 2:
            os.kill(os.getpid(), signal.SIGKILL)
        return idx[0]

    loader = PrefetchLoader(([i] for i in range(6)), make,
                            num_workers=1, prefetch=1, use_processes=True)
    got = []
    try:
        with pytest.raises(WorkerError, match="died"):
            for x in loader:
                got.append(x)
    finally:
        loader.close()
    # SIGKILL may land before the child's queue feeder thread flushes an
    # already-put earlier result to the pipe, so 1 can be lost too — the
    # contract is: completed prefix in order, then a raise (never a hang)
    assert got in ([0], [0, 1])


def test_process_mode_unpicklable_result_raises():
    """mp.Queue pickles asynchronously in the child's feeder thread, where
    a failure silently drops the item; the worker pre-pickles so an
    unpicklable batch surfaces as WorkerError instead of a hang."""
    def make(idx):
        if idx[0] == 1:
            return lambda: None   # unpicklable
        return idx[0]

    loader = PrefetchLoader(([i] for i in range(3)), make,
                            num_workers=1, use_processes=True)
    got = []
    try:
        with pytest.raises(WorkerError, match="not picklable"):
            for x in loader:
                got.append(x)
    finally:
        loader.close()
    assert got == [0]


@pytest.mark.parametrize("nproc", [2])
def test_process_mode_cv2_decode(tmp_path, nproc):
    """Real fork-safety smoke on the actual workload: cv2 decode +
    patchify in worker processes, byte-identical to in-process."""
    import cv2

    path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                         (64, 48))
    for i in range(20):
        vw.write(np.full((48, 64, 3), (i * 7) % 255, np.uint8))
    vw.release()

    from video_r2_tpu.video import VideoPreprocessConfig, fetch_video

    cfg = VideoPreprocessConfig()

    def make(idx):
        f = fetch_video({"video": path, "nframes": 4}, cfg)
        return np.asarray(f.patches)

    ref = make([0])
    loader = PrefetchLoader(([i] for i in range(3)), make,
                            num_workers=nproc, use_processes=True)
    try:
        outs = list(loader)
    finally:
        loader.close()
    assert len(outs) == 3
    for o in outs:
        np.testing.assert_array_equal(o, ref)

"""Train-loop engine: exact step counts (including the trailing partial
dispatch chunk), cadences, and checkpoint calls."""

import numpy as np

from sr3_tpu.parallel.mesh import create_mesh
from sr3_tpu.training.loops import train_loop


class FakeDiffusion:
    def __init__(self):
        self.begin_step = 0
        self.begin_epoch = 0
        self.mesh = create_mesh(num_data=1)
        self.steps_run = 0
        self.dispatches = []
        self.saves = []

    def feed_data(self, data):
        self.data = data

    def optimize_parameters(self):
        self.steps_run += 1
        self.dispatches.append(1)

    def optimize_parameters_multi(self, batches):
        self.steps_run += len(batches)
        self.dispatches.append(len(batches))

    def get_current_log(self):
        return {"l_pix": 0.5}

    def save_network(self, epoch, iter_step):
        self.saves.append(iter_step)

    def wait_for_checkpoints(self):
        pass


def _loader(n, b=2):
    return [
        {"HR": np.zeros((b, 4, 4, 3), np.float32), "Index": np.arange(b)}
        for _ in range(n)
    ]


def _opt(n_iter, spd=1, val_freq=10**9, ckpt_freq=10**9, print_freq=10**9):
    return {
        "train": {
            "n_iter": n_iter,
            "steps_per_dispatch": spd,
            "print_freq": print_freq,
            "val_freq": val_freq,
            "save_checkpoint_freq": ckpt_freq,
        },
        "log_wandb_ckpt": False,
    }


def test_exact_step_count_simple():
    d = FakeDiffusion()
    train_loop(d, _loader(4), _opt(7), lambda s, e: None)
    assert d.steps_run == 7


def test_trailing_partial_chunk_runs():
    """n_iter=5 with steps_per_dispatch=2 must run 2+2+1 steps — the final
    partial chunk used to be counted but dropped (ADVICE round-1)."""
    d = FakeDiffusion()
    train_loop(d, _loader(10), _opt(5, spd=2), lambda s, e: None)
    assert d.steps_run == 5
    assert d.dispatches == [2, 2, 1]


def test_validation_and_checkpoint_cadence():
    d = FakeDiffusion()
    val_at = []
    train_loop(d, _loader(4), _opt(6, val_freq=2, ckpt_freq=3),
               lambda s, e: val_at.append(s))
    assert val_at == [2, 4, 6]
    assert d.saves == [3, 6]
    assert d.steps_run == 6


def test_cadence_fires_on_crossing_when_spd_not_divisible():
    """spd=16 with val_freq=10 must still validate every crossed multiple
    of 10 — at steps 16, 32, 48 — not silently skip (VERDICT r2 weak #1:
    exact-landing cadence checks missed every multiple spd didn't hit)."""
    d = FakeDiffusion()
    val_at = []
    train_loop(d, _loader(60), _opt(48, spd=16, val_freq=10),
               lambda s, e: val_at.append(s))
    assert d.steps_run == 48
    assert val_at == [16, 32, 48]  # crossings of 10; 20/30 covered by 32


def test_checkpoint_never_skipped_with_nondivisible_freq():
    """ckpt freq 7 with spd=3: the only crossing within 10 steps is at
    step 9 (6->9 crosses 7) — must save exactly once, not zero times."""
    d = FakeDiffusion()
    train_loop(d, _loader(20), _opt(10, spd=3, ckpt_freq=7),
               lambda s, e: None)
    assert d.saves == [9]


def test_resident_cadence_crossing_nondivisible():
    class ResidentFake(FakeDiffusion):
        def load_device_dataset(self, dataset):
            pass

        def optimize_parameters_resident(self, batch_size, k_steps):
            self.steps_run += k_steps
            self.dispatches.append(k_steps)

    class Loader:
        batch_size = 2
        dataset = [0] * 6

        def __len__(self):
            return 3

        def __iter__(self):
            raise AssertionError("resident loop must not touch the loader")

    d = ResidentFake()
    opt = _opt(40, spd=16, val_freq=10, ckpt_freq=25)
    opt["datasets"] = {"train": {"device_data": True}}
    val_at = []
    train_loop(d, Loader(), opt, lambda s, e: val_at.append(s))
    assert d.steps_run == 40
    assert val_at == [16, 32, 40]
    assert d.saves == [32]  # 16->32 crosses 25


def test_resume_counters_respected():
    d = FakeDiffusion()
    d.begin_step = 4
    d.begin_epoch = 2
    train_loop(d, _loader(4), _opt(6), lambda s, e: None)
    assert d.steps_run == 2  # only the remaining steps


def test_device_resident_loop_branch():
    """device_data=true routes through load_device_dataset +
    optimize_parameters_resident with exact step counts and cadences."""

    class ResidentFake(FakeDiffusion):
        def load_device_dataset(self, dataset):
            self.loaded = len(dataset)

        def optimize_parameters_resident(self, batch_size, k_steps):
            self.steps_run += k_steps
            self.dispatches.append(k_steps)

    class Loader:
        batch_size = 2

        def __init__(self):
            self.dataset = [0] * 6

        def __len__(self):
            return 3

        def __iter__(self):  # must never be used on the resident path
            raise AssertionError("resident loop must not touch the loader")

    d = ResidentFake()
    opt = _opt(7, spd=3, val_freq=3, ckpt_freq=6)
    opt["datasets"] = {"train": {"device_data": True}}
    val_at = []
    train_loop(d, Loader(), opt, lambda s, e: val_at.append(s))
    assert d.loaded == 6
    assert d.steps_run == 7
    assert d.dispatches == [3, 3, 1]
    assert val_at == [3, 6]
    assert d.saves == [6]


def test_device_resident_allows_batch_larger_than_dataset():
    """On-device sampling draws WITH replacement, so batch_size > dataset
    is legal on the resident path (configs/_traj100k.json trains batch 8 on
    the 6 bundled fixtures); the zero-batches guard must only protect the
    host-loader path."""

    class ResidentFake(FakeDiffusion):
        def load_device_dataset(self, dataset):
            pass

        def optimize_parameters_resident(self, batch_size, k_steps):
            self.steps_run += k_steps

    class Loader:
        batch_size = 8
        dataset = [0] * 6

        def __len__(self):  # 6 samples, batch 8, drop_last
            return 0

        def __iter__(self):
            raise AssertionError("resident loop must not touch the loader")

    d = ResidentFake()
    opt = _opt(4, spd=2)
    opt["datasets"] = {"train": {"device_data": True}}
    train_loop(d, Loader(), opt, lambda s, e: None)
    assert d.steps_run == 4

    # and the host-loader path still refuses to spin forever
    class EmptyLoader(Loader):
        def __iter__(self):
            return iter([])

    import pytest

    with pytest.raises(ValueError, match="zero batches"):
        train_loop(FakeDiffusion(), EmptyLoader(), _opt(4),
                   lambda s, e: None)


def test_nan_guard_raises_by_default():
    """A non-finite loss aborts the run at the print cadence (the loop
    would otherwise train on poisoned Adam moments to n_iter)."""
    import pytest

    class NanFake(FakeDiffusion):
        def get_current_log(self):
            return {"l_pix": float("nan")}

    d = NanFake()
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_loop(d, _loader(10), _opt(6, print_freq=2), lambda s, e: None)
    assert d.steps_run == 2  # stopped at the first print crossing


def test_nan_guard_warn_continues():
    class InfFake(FakeDiffusion):
        def get_current_log(self):
            return {"l_pix": float("inf")}

    d = InfFake()
    opt = _opt(6, print_freq=2)
    opt["train"]["nan_guard"] = "warn"
    train_loop(d, _loader(10), opt, lambda s, e: None)
    assert d.steps_run == 6


def test_nan_guard_off():
    class NanFake(FakeDiffusion):
        def get_current_log(self):
            return {"l_pix": float("nan")}

    d = NanFake()
    opt = _opt(4, print_freq=1)
    opt["train"]["nan_guard"] = "off"
    train_loop(d, _loader(10), opt, lambda s, e: None)
    assert d.steps_run == 4


def test_preemption_sigterm_checkpoints_and_stops():
    """SIGTERM mid-run -> checkpoint at the next step boundary + clean stop
    (GCE delivers SIGTERM ~30s before preempting a TPU VM)."""
    import os
    import signal

    class PreemptFake(FakeDiffusion):
        def optimize_parameters(self):
            super().optimize_parameters()
            if self.steps_run == 3:
                os.kill(os.getpid(), signal.SIGTERM)

    before = signal.getsignal(signal.SIGTERM)
    d = PreemptFake()
    train_loop(d, _loader(10), _opt(10), lambda s, e: None)
    assert d.steps_run == 3        # stopped at the boundary after the signal
    assert d.saves == [3]          # preemption checkpoint written
    assert signal.getsignal(signal.SIGTERM) is before  # handler restored


def test_preemption_resident_path():
    import os
    import signal

    class ResidentFake(FakeDiffusion):
        loaded = None

        def load_device_dataset(self, ds):
            self.loaded = len(ds)

        def optimize_parameters_resident(self, batch_size, k):
            self.steps_run += k
            self.dispatches.append(k)
            if self.steps_run >= 4:
                os.kill(os.getpid(), signal.SIGTERM)

    class Loader:
        batch_size = 2

        def __init__(self):
            self.dataset = [0] * 6

        def __len__(self):
            return 3

    d = ResidentFake()
    opt = _opt(10, spd=2)
    opt["datasets"] = {"train": {"device_data": True}}
    train_loop(d, Loader(), opt, lambda s, e: None)
    assert d.steps_run == 4
    assert d.saves == [4]


def test_preemption_watch_disabled():
    import signal

    before = signal.getsignal(signal.SIGTERM)
    d = FakeDiffusion()
    opt = _opt(4)
    opt["train"]["preempt_checkpoint"] = "off"

    seen = []

    def on_validate(s, e):
        # with the watch off, the loop must not have swapped the handler
        seen.append(signal.getsignal(signal.SIGTERM) is before)

    opt["train"]["val_freq"] = 2
    train_loop(d, _loader(10), opt, on_validate)
    assert d.steps_run == 4
    assert seen and all(seen)

"""Event-driven run engine.

Behavioral spec: reference ``run_utils/engine.py`` — the ``Events`` set
(:7-14), a ``State`` carrying step/epoch counters, per-step tracked outputs
and chained parent links (:17-80), and a ``RunEngine.run`` loop that walks
loaders, fires callbacks, and supports nesting (a validation engine triggered
mid-training with shared state, :140-216).

Differences: the network payload is a functional holder (``NetHolder``)
around the jitted train step and the optax ``TrainState`` instead of mutable
torch modules, and progress reporting uses logging rather than tqdm bars.
"""
from __future__ import annotations

import logging
from enum import Enum
from typing import Callable, Dict, Optional

import jax


class Events(Enum):
    EPOCH_STARTED = "epoch_started"
    EPOCH_COMPLETED = "epoch_completed"
    STEP_STARTED = "step_started"
    STEP_COMPLETED = "step_completed"
    STARTED = "started"
    COMPLETED = "completed"
    EXCEPTION_RAISED = "exception_raised"


class NetHolder:
    """Mutable holder the engine/callbacks thread the functional pieces
    through: the TrainState is replaced after every step (the functional
    analog of in-place optimizer.step())."""

    def __init__(self, state, train_step=None, schedule=None, rng=None,
                 extra_info=None, cfg=None):
        self.state = state
        self.train_step = train_step
        self.schedule = schedule
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.extra_info = extra_info or {}
        self.cfg = cfg

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    @property
    def lr(self) -> float:
        if self.schedule is None:
            return float("nan")
        return float(self.schedule(int(self.state.step)))


class State:
    """Shared mutable state passed to every callback."""

    def __init__(self):
        self.logging = None
        self.log_dir = None
        self.log_info = None

        self.loader_name = None
        self.curr_epoch_step = 0
        self.curr_global_step = 0
        self.curr_epoch = 0

        self.tracked_step_output = {"scalar": {}, "image": {}}
        self.epoch_accumulated_output = []
        self.run_accumulated_output = []
        self.step_output = None
        self.global_state = None
        self.run_info: Dict = {}
        self.batch_size = None

    def reset_variable(self, reset_tracker: bool = False) -> None:
        self.tracked_step_output = {k: {} for k in self.tracked_step_output}
        if reset_tracker:
            self.curr_epoch_step = 0
            self.curr_global_step = 0
            self.curr_epoch = 0
        self.epoch_accumulated_output = []
        self.step_output = None

    def get_top_parent_state(self) -> "State":
        curr = self
        while curr is not None:
            prev = curr
            curr = curr.global_state
        return prev


class RunEngine:
    def __init__(self, engine_name: str, loader_dict: Dict,
                 run_step: Callable, run_info: Dict,
                 log_info: Optional[Dict] = None,
                 separate_loader_output: bool = True):
        self.engine_name = engine_name
        self.run_step = run_step
        self.loader_dict = loader_dict
        self.separate_loader_output = separate_loader_output

        self.state = State()
        self.state.attached_engine_name = engine_name
        self.state.run_info = run_info
        self.state.log_info = log_info

        self.event_handler_dict = {event: [] for event in Events}
        self.terminate = False

    def add_event_handler(self, event_name: Events, handler) -> None:
        self.event_handler_dict[event_name].append(handler)

    def _trigger_events(self, event: Events) -> None:
        for callback in self.event_handler_dict[event]:
            callback.run(self.state, event)

    def run(self, nr_epoch: int = 1, shared_state: Optional[State] = None,
            chained: bool = False) -> None:
        if chained:
            self.state.curr_epoch = 0
        self.state.global_state = shared_state

        self._trigger_events(Events.STARTED)
        while self.state.curr_epoch < nr_epoch:
            if not chained:
                logging.info("EPOCH %d", self.state.curr_epoch + 1)
            self.state.reset_variable(reset_tracker=chained)

            for loader_name, loader in self.loader_dict.items():
                if self.separate_loader_output:
                    self.state.reset_variable(reset_tracker=chained)
                self.state.batch_size = getattr(loader, "batch_size", None)
                self._trigger_events(Events.EPOCH_STARTED)

                for data_batch in loader:
                    self._trigger_events(Events.STEP_STARTED)
                    step_run_info = [
                        self.state.run_info,
                        {"epoch": self.state.curr_epoch,
                         "step": self.state.curr_global_step},
                    ]
                    self.state.step_output = self.run_step(data_batch,
                                                           step_run_info)
                    if self.separate_loader_output:
                        self.state.loader_name = loader_name
                    self._trigger_events(Events.STEP_COMPLETED)
                    self.state.curr_global_step += 1
                    self.state.curr_epoch_step += 1

                if self.separate_loader_output:
                    self.state.curr_epoch += 1
                    self._trigger_events(Events.EPOCH_COMPLETED)

            if not self.separate_loader_output:
                self.state.curr_epoch += 1
                self.state.loader_name = None
                self._trigger_events(Events.EPOCH_COMPLETED)

            self.state.run_accumulated_output.append(
                self.state.epoch_accumulated_output)
        self._trigger_events(Events.COMPLETED)
        # join async checkpoint writes (PeriodicSaver): when a TOP-LEVEL
        # run() returns, every checkpoint it scheduled is durable on disk.
        # Chained runs (TriggerEngine validation mid-training) must NOT
        # flush — that would re-serialize each save with the very next
        # validation pass and defeat the overlap
        if not chained:
            from ..models.convert import flush_pending_saves

            flush_pending_saves()

"""Plant simulator with optional per-channel input delay.

Mirrors ``DynamicsSimulator`` (``/root/reference/DGSQP/dynamics/dynamics_simulator.py:11-41``):
steps a high-rate model forward for T seconds, buffering actuation commands through deques to
model actuation latency.
"""
from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np

from dgsqp_tpu.dynamics.models import DynamicsModel
from dgsqp_tpu.types import VehicleState


class DynamicsSimulator:
    def __init__(self, t0: float, model: DynamicsModel, delay: Optional[list] = None, track=None):
        self.model = model
        self.t0 = t0
        self.track = track if track is not None else model.track
        if delay is not None:
            # delay[i] = seconds of latency on input channel i
            self.delay_steps = [max(1, int(round(d / model.dt))) for d in delay]
            self.input_buffer = [deque([0.0] * n, maxlen=n) for n in self.delay_steps]
        else:
            self.input_buffer = None

    def step(self, state: VehicleState, T: Optional[float] = None,
             rng: Optional[np.random.Generator] = None):
        if rng is not None and self.model.noise_sqrt is not None:
            # inject one additive noise sample per step (fault-injection hook)
            q, u = self.model.state2qu(state)
            w = self.model.noise_sqrt @ rng.standard_normal(self.model.n_q)
            self.model.qu2state(state, q + w, None)
        if self.input_buffer is not None:
            u = self.model.state2qu(state)[1]
            delayed = np.array([buf[0] for buf in self.input_buffer])
            for i, buf in enumerate(self.input_buffer):
                buf.append(u[i])
            self.model.qu2state(state, None, delayed)
        self.model.step(state, T=T)
        return state

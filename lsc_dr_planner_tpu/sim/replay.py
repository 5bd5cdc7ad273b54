"""Simulation-log replayer.

Capability parity with MultiSyncReplayer (reference:
src/multi_sync_replayer.cpp — wide-CSV parsing :54-110, 50 Hz linear
state interpolation :140-172, RViz rendering :174-...). Instead of RViz
this replayer provides programmatic state access (for regression
checks) and optional matplotlib rendering to PNG/GIF.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class ReplayLog:
    times: np.ndarray  # [T]
    agent_states: np.ndarray  # [T, A, 9] (pos, vel, acc)
    planning_times: np.ndarray  # [T, A]
    obstacle_states: np.ndarray  # [T, O, 4] (pos, size)

    @property
    def qn(self):
        return self.agent_states.shape[1]

    @property
    def on(self):
        return self.obstacle_states.shape[1]


def read_csv(path: str) -> ReplayLog:
    """Parse the wide per-agent/per-obstacle simulation CSV (the schema
    written by the simulator and the reference,
    multi_sync_simulator.cpp:586-656)."""
    with open(path) as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f if line.strip()]

    # count agent blocks (12 cols each: id,t,px..az,planning_time) and
    # obstacle blocks (6 cols: obs_id,t,px,py,pz,size)
    qn = header.count("id")
    on = header.count("obs_id")
    agent_w, obs_w = 12, 6

    T = len(rows)
    times = np.zeros(T)
    ag = np.zeros((T, qn, 9))
    pt = np.zeros((T, qn))
    ob = np.zeros((T, max(on, 1), 4)) if on else np.zeros((T, 0, 4))
    for t, row in enumerate(rows):
        vals = [float(v) for v in row]
        times[t] = vals[1]
        for qi in range(qn):
            off = qi * agent_w
            ag[t, qi] = vals[off + 2 : off + 11]
            pt[t, qi] = vals[off + 11]
        for oi in range(on):
            off = qn * agent_w + oi * obs_w
            ob[t, oi] = vals[off + 2 : off + 6]
    return ReplayLog(times, ag, pt, ob[:, :on] if on else np.zeros((T, 0, 4)))


def state_at(log: ReplayLog, t: float) -> np.ndarray:
    """Linearly interpolated agent states at time t (reference
    doReplay/linear interpolation, multi_sync_replayer.cpp:140-172)."""
    times = log.times
    t = float(np.clip(t, times[0], times[-1]))
    i = int(np.searchsorted(times, t, side="right") - 1)
    i = min(i, len(times) - 2)
    denom = max(times[i + 1] - times[i], 1e-9)
    a = (t - times[i]) / denom
    return (1 - a) * log.agent_states[i] + a * log.agent_states[i + 1]


def replay(log: ReplayLog, rate_hz: float = 50.0):
    """Iterate interpolated states at the given rate (generator)."""
    t = log.times[0]
    while t <= log.times[-1] + 1e-9:
        yield t, state_at(log, t)
        t += 1.0 / rate_hz


def render_png(log: ReplayLog, out_path: str, world_boxes: Optional[np.ndarray] = None,
               stride: int = 5):
    """Top-down trajectory plot (matplotlib, headless)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    if world_boxes is not None:
        for cx, cy, cz, sx, sy, sz in world_boxes:
            ax.add_patch(
                plt.Rectangle((cx - sx / 2, cy - sy / 2), sx, sy,
                              color="0.3", alpha=0.6)
            )
    cmap = plt.get_cmap("hsv")
    for qi in range(log.qn):
        xy = log.agent_states[::stride, qi, :2]
        c = cmap(qi / max(log.qn, 1))
        ax.plot(xy[:, 0], xy[:, 1], color=c, lw=1)
        ax.plot(*xy[0], marker="o", color=c, ms=5)
        ax.plot(*xy[-1], marker="*", color=c, ms=9)
    ax.set_aspect("equal")
    ax.set_title("trajectory replay")
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path

"""Action batching, pacing and the per-decision CSV log.

Mirrors readuntil::Data's action consumer (src/minknow/Data.cpp:137-257):

* actions are sent in batches of at most ``batch_size`` (initial 50,
  src/minknow/Data.hpp:81),
* adaptive batch sizing: grow by the queue backlog when the queue is
  longer than the batch, decay by x0.8 otherwise
  (adaptActionBatchSize, src/minknow/Data.cpp:265-275),
* at least ``pacing_seconds`` (0.4 s) between requests
  (src/minknow/Data.cpp:245-252) — enforced in wall-clock mode, counted
  in replay-tick mode,
* unblock actions carry the 0.1 s voltage-flip duration
  (src/minknow/Data.cpp:171),
* every decision is appended to ``read_until_decision_stats.csv`` with
  {read_id, channel, read_nr, sequence length, decision, duration}
  (src/minknow/Data.cpp:143-146,174-187).
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass, field
from pathlib import Path

__all__ = ["Action", "ActionSender"]

UNBLOCK_DURATION_SECONDS = 0.1  # reference: src/minknow/Data.cpp:171


@dataclass
class Action:
    channel: int
    read_number: int
    read_id: str
    unblock: bool  # True: unblock; False: stop_receiving_data
    seq_length: int = 0
    queued_at: float = 0.0
    processing_seconds: float = 0.0


class ActionSender:
    """Batches actions to the (replayed) device with pacing + CSV log."""

    def __init__(
        self,
        source,
        output_dir: str | Path = ".",
        batch_size: int = 50,
        pacing_seconds: float = 0.4,
        wall_clock: bool = False,
    ):
        self.source = source
        self.batch_size = batch_size
        self.pacing_seconds = pacing_seconds
        self.wall_clock = wall_clock
        self._queue: list[Action] = []
        self._last_send = 0.0
        self.succeeded = 0
        self.failed = 0
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        self._csv_file = open(out / "read_until_decision_stats.csv", "w", newline="")
        self._csv = csv.writer(self._csv_file, delimiter=";")
        self._csv.writerow(
            ["read_id", "channel", "read_nr", "sequence_length", "decision", "duration"]
        )

    def queue(self, action: Action) -> None:
        action.queued_at = time.monotonic()
        self._queue.append(action)

    def _adapt_batch_size(self) -> None:
        qsize = len(self._queue)
        if qsize > self.batch_size:
            self.batch_size += qsize
        else:
            self.batch_size = max(1, int(self.batch_size * 0.8))

    def flush(self) -> int:
        """Send one paced batch; returns the number of actions applied."""
        if not self._queue:
            return 0
        if self.wall_clock:
            wait = self.pacing_seconds - (time.monotonic() - self._last_send)
            if wait > 0:
                time.sleep(wait)
        self._adapt_batch_size()
        batch, self._queue = self._queue[: self.batch_size], self._queue[self.batch_size :]
        applied = 0
        for a in batch:
            if a.unblock:
                ok = self.source.unblock(a.channel, a.read_number)
            else:
                ok = self.source.stop_receiving(a.channel, a.read_number)
            applied += ok
            self.succeeded += ok
            self.failed += not ok
            self._csv.writerow(
                [
                    a.read_id,
                    a.channel,
                    a.read_number,
                    a.seq_length,
                    "unblock" if a.unblock else "stop_receiving",
                    f"{a.processing_seconds:.6f}",
                ]
            )
        self._last_send = time.monotonic()
        return applied

    def drain(self) -> int:
        total = 0
        while self._queue:
            total += self.flush()
        return total

    def close(self) -> None:
        self._csv_file.close()

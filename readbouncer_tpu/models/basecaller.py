"""Batched basecaller service over the GRU model.

Keeps the reference's ``Basecaller`` interface shape (abstract
basecall_live_reads, src/basecaller/Basecaller.hpp:21-28) so a remote
basecaller could be slotted in, but the native implementation is the
on-chip JAX GRU: signals are framed on the host, batched to fixed
[B, T] shapes, run through one jitted forward, and CTC-decoded.

The reference's "short result" handling (basecalled chunks under 250 bp
are parked and concatenated with the read's next chunk,
src/basecaller/DeepNano/DeepNanoBasecaller.cpp:52-97) lives in the live
scheduler (stream/), not here — this class is a pure
signal-batch -> sequences function.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from readbouncer_tpu.models.ctc import beam_search_decode, greedy_decode
from readbouncer_tpu.models.gru import GRUBasecallerModel, frame_signal, med_mad_normalize
from readbouncer_tpu.models.weights import (
    default_weights_path,
    load_deepnano_weights,
    load_params_npz,
    synth_weights_path,
)

__all__ = ["Basecaller", "GRUBasecaller"]


class Basecaller:
    """Abstract surface (reference: src/basecaller/Basecaller.hpp:21-28)."""

    def basecall(self, signals: list[np.ndarray]) -> list[str]:
        raise NotImplementedError


@dataclass
class GRUBasecaller(Basecaller):
    network: str = "48"
    weights_dir: str = ""
    frame_stride: int = 5
    max_frames: int = 2048  # static T of the compiled program
    decoder: str = "greedy"  # or "beam"
    beam_size: int = 5
    beam_cut_threshold: float = 0.01
    # rnn*.txt gate-group assignment: "zrn" | "rzn" (weights.py,
    # docs/BASECALLER.md) — only meaningful for DeepNano-blitz nets
    gate_order: str = "zrn"

    def __post_init__(self):
        """Resolve the network name to weights.

        ``network`` is either a DeepNano-blitz net id ("48".."96" — the
        rnn<net>.txt files, reference src/weights/), a trained-params id
        ("synth48" etc. — data/gru_<net>.npz from
        scripts/train_basecaller.py), or an explicit .npz path.
        """
        if self.network.endswith(".npz"):
            params = load_params_npz(self.network)
            self.model = GRUBasecallerModel(
                None, frame_stride=self.frame_stride, params_in=params
            )
        elif self.network.startswith("synth"):
            params = load_params_npz(synth_weights_path(self.network, self.weights_dir))
            self.model = GRUBasecallerModel(
                None, frame_stride=self.frame_stride, params_in=params
            )
        else:
            w = load_deepnano_weights(
                default_weights_path(self.network, self.weights_dir),
                gate_order=self.gate_order,
            )
            self.model = GRUBasecallerModel(w, frame_stride=self.frame_stride)

    def frames_for(self, signal: np.ndarray) -> np.ndarray:
        return frame_signal(
            med_mad_normalize(signal),
            window=self.model.window,
            stride=self.frame_stride,
            max_frames=self.max_frames,
        )

    def _warn_truncation(self, signals) -> None:
        w, st = self.model.window, self.frame_stride
        T = self.max_frames
        truncated = sum(
            1 for s in signals if (max(len(s), w) - w) // st + 1 > T
        )
        if truncated and not getattr(self, "_warned_truncation", False):
            self._warned_truncation = True
            import warnings

            warnings.warn(
                f"GRUBasecaller: {truncated} signal(s) exceed max_frames="
                f"{T} and lose their tail; raise max_frames for offline "
                "use on full-length reads",
                stacklevel=2,
            )

    def basecall_submit(self, signals: list[np.ndarray]):
        """Dispatch the device forward; returns a handle for
        basecall_collect.  Greedy path: ships the NORMALIZED SIGNAL
        [B, S] (not frames — host framing amplifies the upload 13.2x,
        docs/PERF_NOTES.md) and returns device argmax tokens; only
        [B, T] int32 crosses back.  Beam path keeps the logits route.

        The split lets the live scheduler overlap basecall(t+1) with
        classify(t) — the device call is async until collected.
        """
        if not signals:
            return None
        w, st, T = self.model.window, self.frame_stride, self.max_frames
        self._warn_truncation(signals)
        # pad the batch to a power-of-two bucket (floor 32): the jitted
        # forward compiles per (B, S) shape and live ticks carry a
        # different chunk count every tick — unbucketed batches would
        # recompile server-side mid-run (minutes each on the tunnel)
        B = max(32, 1 << (len(signals) - 1).bit_length())
        if self.decoder == "beam":
            framed = [self.frames_for(s) for s in signals]
            batch = np.zeros((B, T, w), dtype=np.float32)
            lens = np.zeros(B, dtype=np.int32)
            for i, f in enumerate(framed):
                n = min(f.shape[0], T)
                batch[i, :n] = f[:n]
                lens[i] = n
            return ("beam", self.model.logits(batch), lens, len(signals))
        S = (T - 1) * st + w
        batch = np.zeros((B, S), dtype=np.float16)
        lens = np.zeros(B, dtype=np.int32)
        sizes = {len(s) for s in signals}
        if len(sizes) == 1 and next(iter(sizes)) >= w:
            # uniform-length chunks (the steady live tick): vectorized
            # median/MAD over the whole batch
            sig = np.stack([np.asarray(s, dtype=np.float32) for s in signals])
            med = np.median(sig, axis=1, keepdims=True)
            mad = np.median(np.abs(sig - med), axis=1, keepdims=True) + 1e-6
            L = min(sig.shape[1], S)
            batch[: len(signals), :L] = ((sig[:, :L] - med) / mad).astype(
                np.float16
            )
            lens[: len(signals)] = min((L - w) // st + 1, T)
        else:
            for i, s in enumerate(signals):
                norm = med_mad_normalize(s)[:S]
                batch[i, : norm.shape[0]] = norm.astype(np.float16)
                lens[i] = min((max(norm.shape[0], w) - w) // st + 1, T)
        return ("greedy", self.model.tokens_from_signal(batch), lens, len(signals))

    def basecall_collect(self, handle) -> list[str]:
        """Fetch + decode a basecall_submit handle."""
        if handle is None:
            return []
        kind, dev, lens, n = handle
        if kind == "beam":
            logits = np.asarray(dev)[:n]
            return [
                beam_search_decode(
                    logits[i], self.beam_size, self.beam_cut_threshold, int(lens[i])
                )
                for i in range(n)
            ]
        from readbouncer_tpu.models.ctc import greedy_decode_ids

        tokens = np.asarray(dev)[:n]
        return [greedy_decode_ids(tokens[i], int(lens[i])) for i in range(n)]

    # full-channel live ticks (~512 chunks) are the p95 tail: one big
    # submit serializes host framing, the device forward, and the host
    # CTC decode.  Splitting at >= this many signals into two
    # half-batches lets half 2's host prep ride behind half 1's device
    # forward and half 1's decode behind half 2's — same device work
    # (two pow2 buckets of half size), ~20-40 ms less exposed host/wire
    # time on burst ticks.
    split_threshold: int = 256

    def basecall(self, signals: list[np.ndarray]) -> list[str]:
        """Raw current signals -> basecalled sequences (batched)."""
        if len(signals) >= max(2, self.split_threshold):
            mid = len(signals) // 2
            h1 = self.basecall_submit(signals[:mid])
            h2 = self.basecall_submit(signals[mid:])
            return self.basecall_collect(h1) + self.basecall_collect(h2)
        return self.basecall_collect(self.basecall_submit(signals))

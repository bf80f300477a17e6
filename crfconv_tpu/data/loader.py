"""Multiscale batching loader with background prefetch.

The reference ran its collate (5 × kNN per batch) inline on the main
thread with num_workers=0 (trainval.py:54) — the single biggest
throughput sin identified in SURVEY.md §7 "hard parts" #5.  Here batch
assembly + pyramid construction run in a background thread, overlapped
with device steps, with the next batch already transferred to the device
(double buffering) while the current one computes.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from crfconv_tpu.data.batch import PointBatch
from crfconv_tpu.data.pipeline import build_pyramid, make_batch


class MultiscaleLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        kernel_sizes: Sequence[int] = (16, 16, 16, 16, 16),
        ratios: Sequence[int] = (4, 4, 4, 4, 2),
        k_up: int = 1,
        dilations: Optional[Sequence[int]] = None,
        sample_method: str = "random",
        transform: Optional[Callable] = None,
        seed: int = 0,
        prefetch: int = 2,
        device_put: bool = True,
        emit: str = "pyramid",   # 'pyramid' -> PointBatch, 'raw' -> RawBatch
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``num_shards``/``shard_index`` shard the input pipeline across
        host processes (SURVEY.md §7: per-process input sharding): each
        process draws an independent sample stream (seed folded with the
        shard index) and owns 1/num_shards of the per-epoch batches;
        ``batch_size`` is the PER-PROCESS batch.  Pass
        ``num_shards=jax.process_count(), shard_index=jax.process_index()``
        on a multi-host mesh."""
        assert emit in ("pyramid", "raw")
        assert 0 <= shard_index < num_shards
        self.emit = emit
        self.dataset = dataset
        self.batch_size = batch_size
        self.kernel_sizes = tuple(kernel_sizes)
        self.ratios = tuple(ratios)
        self.k_up = k_up
        self.dilations = dilations
        self.sample_method = sample_method
        self.transform = transform
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.rng = np.random.default_rng(
            np.random.SeedSequence([seed, shard_index])
            if num_shards > 1
            else seed
        )
        self.prefetch = prefetch
        self.device_put = device_put

    def __len__(self) -> int:
        return max(len(self.dataset) // (self.batch_size * self.num_shards), 1)

    # ------------------------------------------------------------------
    def _assemble(self) -> PointBatch:
        samples = []
        for _ in range(self.batch_size):
            s = self.dataset.get_sample(self.rng)
            if self.transform is not None:
                s = self.transform(s, self.rng)
            samples.append(s)

        pos = np.stack([s["pos"] for s in samples]).astype(np.float32)
        x = np.stack([s["x"] for s in samples]).astype(np.float32)
        y = (
            np.stack([s["y"] for s in samples])
            if "y" in samples[0]
            else None
        )
        point_idx = (
            np.stack([s["point_idx"] for s in samples])
            if "point_idx" in samples[0]
            else None
        )
        cloud_idx = (
            np.asarray([s["cloud_idx"] for s in samples])
            if "cloud_idx" in samples[0]
            else None
        )
        category = (
            np.asarray([s["category"] for s in samples])
            if "category" in samples[0]
            else None
        )
        if self.emit == "raw":
            import jax.numpy as jnp

            from crfconv_tpu.data.batch import RawBatch

            put = (lambda a: jnp.asarray(a)) if self.device_put else (lambda a: a)
            return RawBatch(
                pos=put(pos),
                x=put(x),
                y=None if y is None else put(y.astype(np.int32)),
                point_idx=None if point_idx is None else put(point_idx),
                cloud_idx=None if cloud_idx is None else put(cloud_idx),
                category=None if category is None else put(category),
            )
        scales = build_pyramid(
            pos,
            self.kernel_sizes,
            self.ratios,
            k_up=self.k_up,
            dilations=self.dilations,
            method=self.sample_method,
            rng=self.rng,
        )
        return make_batch(
            x, y, scales,
            point_idx=point_idx,
            cloud_idx=cloud_idx,
            category=category,
            device_put=self.device_put,
        )

    def __iter__(self) -> Iterator[PointBatch]:
        n = len(self)
        if self.prefetch <= 0:
            for _ in range(n):
                yield self._assemble()
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for _ in range(n):
                    if stop.is_set():
                        return
                    q.put(self._assemble())
                q.put(None)
            except BaseException as e:  # surface worker errors to consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def loader_state_dict(loader: "MultiscaleLoader") -> dict:
    """Checkpointable loader state: the sample-draw RNG (and, when the
    dataset owns a possibility sampler, its state too)."""
    state = {"rng_state": loader.rng.bit_generator.state}
    sampler = getattr(loader.dataset, "sampler", None)
    if sampler is not None and hasattr(sampler, "state_dict"):
        state["sampler"] = sampler.state_dict()
    return state


def loader_load_state_dict(loader: "MultiscaleLoader", state: dict) -> None:
    loader.rng.bit_generator.state = state["rng_state"]
    sampler = getattr(loader.dataset, "sampler", None)
    if sampler is not None and "sampler" in state:
        sampler.load_state_dict(state["sampler"])

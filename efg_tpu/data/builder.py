"""Dataset / processor / dataloader builders.

Rebuild of `efg/data/builder.py:20-164` for the fixed-shape TPU pipeline:
the loader emits numpy batches of static shapes — padded points + masks,
padded GT arrays — ready to be device-put and sharded over the `data` mesh
axis. Training uses a threaded prefetcher (the reference used torch
DataLoader worker processes); evaluation iterates in order.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from efg_tpu.data.registry import DATASETS, PROCESSORS, SAMPLERS
from efg_tpu.utils.seed import seed_all_rng


def build_processors(processor_cfgs) -> List[Any]:
    """YAML list of `Name` or `{Name: kwargs}` → instances
    (reference `efg/data/builder.py:153-164`)."""
    out = []
    for item in processor_cfgs:
        if isinstance(item, str):
            out.append(PROCESSORS.get(item)())
        else:
            (name, kwargs), = item.items()
            kwargs = dict(kwargs) if kwargs else {}
            out.append(PROCESSORS.get(name)(**kwargs))
    return out


def build_dataset(config):
    return DATASETS.get(config.dataset.type)(config)


def pad_gt(
    annotations: Optional[dict], max_gt: int, box_dim: int = 9
) -> Dict[str, np.ndarray]:
    """annotations {gt_boxes [G, D], labels [G]} → fixed [max_gt] arrays."""
    boxes = np.zeros((max_gt, box_dim), np.float32)
    classes = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    if annotations is not None and len(annotations.get("gt_boxes", [])) > 0:
        gb = np.asarray(annotations["gt_boxes"], np.float32)
        g = min(len(gb), max_gt)
        d = min(gb.shape[1], box_dim)
        boxes[:g, :d] = gb[:g, :d]
        if gb.shape[1] == 7 and box_dim == 9:
            # 7-dim boxes: move yaw to the last slot, zero velocity
            boxes[:g, 8] = gb[:g, 6]
            boxes[:g, 6:8] = 0
        classes[:g] = np.asarray(annotations["labels"], np.int64)[:g]
        mask[:g] = True
    return {"gt_boxes": boxes, "gt_classes": classes, "gt_mask": mask}


def pad_gt2d(annotations: Optional[dict], max_gt: int) -> Dict[str, np.ndarray]:
    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    if annotations is not None and len(annotations.get("boxes2d", [])) > 0:
        keep = annotations.get("iscrowd")
        b = np.asarray(annotations["boxes2d"], np.float32)
        c = np.asarray(annotations["classes"], np.int64)
        if keep is not None:
            sel = np.asarray(keep) == 0
            b, c = b[sel], c[sel]
        g = min(len(b), max_gt)
        boxes[:g] = b[:g]
        classes[:g] = c[:g]
        mask[:g] = True
    return {"gt_boxes2d": boxes, "gt_classes2d": classes, "gt_mask2d": mask}


def collate_fixed(samples: List, max_gt: int) -> Dict[str, Any]:
    """List of dataset items `(data, info)` → fixed-shape numpy batch.
    `data` must be a fixed-shape dict: the `PadPoints` output (3D) or the
    `PadImage` output (2D)."""
    batch: Dict[str, Any] = {}
    first = samples[0][0]
    assert isinstance(first, dict), (
        "TPU pipeline requires PadPoints/PadImage as the final data "
        "transform (fixed-shape contract)"
    )
    if "points" in first:
        pts, msk, gtb, gtc, gtm = [], [], [], [], []
        det_b, det_s, det_m = [], [], []
        for data, info in samples:
            pts.append(data["points"])
            msk.append(data["points_mask"])
            anno = info.get("annotations")
            g = pad_gt(anno, max_gt)
            gtb.append(g["gt_boxes"])
            gtc.append(g["gt_classes"])
            gtm.append(g["gt_mask"])
            if anno is not None and "det_boxes" in anno:
                db = np.zeros((max_gt, 9), np.float32)
                ds = np.zeros((max_gt,), np.float32)
                dm = np.zeros((max_gt,), bool)
                n = min(len(anno["det_boxes"]), max_gt)
                db[:n] = anno["det_boxes"][:n]
                ds[:n] = anno["det_scores"][:n]
                dm[:n] = True
                det_b.append(db)
                det_s.append(ds)
                det_m.append(dm)
        batch["points"] = np.stack(pts)
        batch["points_mask"] = np.stack(msk)
        batch["gt_boxes"] = np.stack(gtb)
        batch["gt_classes"] = np.stack(gtc)
        batch["gt_mask"] = np.stack(gtm)
        if det_b:
            batch["det_boxes"] = np.stack(det_b)
            batch["det_scores"] = np.stack(det_s)
            batch["det_mask"] = np.stack(det_m)
        anno0 = samples[0][1].get("annotations") or {}
        if "traj_hist" in anno0:
            # trajectory fields for the motion-pretrain regime
            for key in ("traj_hist", "traj_mask", "future_offsets", "future_mask"):
                rows = []
                for _, info in samples:
                    a = np.asarray(info["annotations"][key])
                    pad = np.zeros((max_gt,) + a.shape[1:], a.dtype)
                    pad[: min(len(a), max_gt)] = a[:max_gt]
                    rows.append(pad)
                batch[key] = np.stack(rows)
    elif "image" in first:
        imgs, gtb, gtc, gtm, masks, kpts = [], [], [], [], [], []
        for data, info in samples:
            imgs.append(data["image"])
            anno = info.get("annotations")
            g = pad_gt2d(anno, max_gt)
            gtb.append(g["gt_boxes2d"])
            gtc.append(g["gt_classes2d"])
            gtm.append(g["gt_mask2d"])
            if anno is not None and "masks_fixed" in anno:
                m = anno["masks_fixed"]
                pad = np.zeros((max_gt,) + m.shape[1:], np.float32)
                pad[: min(len(m), max_gt)] = m[:max_gt]
                masks.append(pad)
            if anno is not None and anno.get("keypoints") is not None:
                k = np.asarray(anno["keypoints"], np.float32)
                pad = np.zeros((max_gt,) + k.shape[1:], np.float32)
                pad[: min(len(k), max_gt)] = k[:max_gt]
                kpts.append(pad)
        batch["images"] = np.stack(imgs)
        batch["gt_boxes2d"] = np.stack(gtb)
        batch["gt_classes2d"] = np.stack(gtc)
        batch["gt_mask2d"] = np.stack(gtm)
        if masks:
            batch["gt_masks"] = np.stack(masks)
            batch["gt_classes_seg"] = batch["gt_classes2d"]
            batch["gt_mask_valid"] = batch["gt_mask2d"]
        if kpts:
            batch["gt_keypoints"] = np.stack(kpts)  # [B, G, K, 3]
    else:
        raise ValueError(f"Unknown fixed-shape sample keys: {list(first)}")
    batch["metadata"] = [s[1].get("metadata", {}) for s in samples]
    batch["annotations"] = [s[1].get("annotations") for s in samples]
    return batch


class DataLoader:
    """Minimal prefetching loader over (dataset, sampler)."""

    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        max_gt: int = 500,
        num_workers: int = 0,
        seed: Optional[int] = None,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        # Resume fast-forward: iterators skip the first `start_batch`
        # batches by discarding sampler indices (no item fetch, no
        # transform replay). With a seed set, augmentation RNG is derived
        # per item ORDINAL (see _seed_for), so the post-skip stream is
        # bit-identical to an uninterrupted run's.
        self.start_batch = 0

    def _seed_for(self, ordinal: int) -> int:
        """Deterministic per-item RNG stream: item k's augmentations draw
        from seed f(loader_seed, k) regardless of what ran before — the
        foundation for exact checkpoint-resume continuity and for
        order-independent multi-worker loading."""
        return (self.seed * 1_000_003 + ordinal * 7_368_787) % (2**31 - 1)

    def __len__(self) -> int:
        try:
            n = len(self.sampler)
        except TypeError:
            n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _fetch(self, idx: int, ordinal: int):
        if self.seed is not None:
            seed_all_rng(self._seed_for(ordinal))
        return self.dataset[idx]

    def _skipped_indices(self):
        """Fresh sampler iterator with the first start_batch batches of
        indices discarded; returns (iterator, first_ordinal)."""
        it = iter(self.sampler)
        n_skip = self.start_batch * self.batch_size
        for _ in range(n_skip):
            try:
                next(it)
            except StopIteration:
                break
        return it, n_skip

    def _iter_sequential(self) -> Iterator[Dict[str, Any]]:
        buf = []
        it, ordinal = self._skipped_indices()
        for idx in it:
            buf.append(self._fetch(idx, ordinal))
            ordinal += 1
            if len(buf) == self.batch_size:
                yield collate_fixed(buf, self.max_gt)
                buf = []
        if buf and not self.drop_last:
            while len(buf) < self.batch_size:  # repeat-pad the tail batch
                buf.append(buf[-1])
            yield collate_fixed(buf, self.max_gt)

    def _iter_threaded(self) -> Iterator[Dict[str, Any]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=4)
        idx_iter, base_ordinal = self._skipped_indices()
        counter = [base_ordinal]
        lock = threading.Lock()
        stop = threading.Event()

        def worker(wid: int):
            if self.seed is not None:
                seed_all_rng(self.seed + wid)
            while not stop.is_set():
                items = []
                with lock:
                    ordinal0 = counter[0]
                    try:
                        for _ in range(self.batch_size):
                            items.append(next(idx_iter))
                            counter[0] += 1
                    except StopIteration:
                        break
                if len(items) < self.batch_size:
                    break
                batch = collate_fixed(
                    [self._fetch(i, ordinal0 + k) for k, i in enumerate(items)],
                    self.max_gt,
                )
                out_q.put(batch)
            out_q.put(None)

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(max(1, self.num_workers))
        ]
        for t in threads:
            t.start()
        finished = 0
        try:
            while finished < len(threads):
                item = out_q.get()
                if item is None:
                    finished += 1
                    continue
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.num_workers and self.num_workers > 0:
            return self._iter_threaded()
        return self._iter_sequential()


def build_dataloader(config, dataset, train: bool = True) -> DataLoader:
    """Reference `build_dataloader` (`efg/data/builder.py:103-151`)."""
    dl = config.dataloader
    max_gt = int(config.dataset.get("max_gt", config.get("model", {}).get("loss", {}).get("max_objs", 500)))
    if train:
        sampler_name = dl.get("sampler", "DistributedInfiniteSampler")
        seed = config.misc.get("seed", -1)
        kw = dict(shuffle=True, seed=None if seed is None or seed < 0 else seed)
        if sampler_name == "DistributedGroupSampler":
            # aspect-ratio group batching (reference dataset_sampler.py:109)
            kw.update(
                aspect_ratios=getattr(dataset, "aspect_ratios", None),
                samples_per_batch=int(dl.batch_size),
            )
        sampler = SAMPLERS.get(sampler_name)(len(dataset), **kw)
        return DataLoader(
            dataset, sampler, int(dl.batch_size), max_gt=max_gt,
            num_workers=int(dl.get("num_workers", 0)),
            seed=None if seed is None or seed < 0 else seed,
        )
    sampler = SAMPLERS.get(dl.get("eval_sampler", "InferenceSampler"))(len(dataset))
    return DataLoader(
        dataset, sampler, int(dl.get("eval_batch_size", dl.batch_size)),
        max_gt=max_gt, num_workers=0, drop_last=False,
    )

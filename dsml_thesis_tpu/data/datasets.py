"""Datasets (numpy/PIL, torch-free) + a threaded batch loader.

Parity targets (behavior, not code):
  - AffectNet path-list datasets, label parsed from filename prefix:
    face_reenactment/taming/data/{custom.py:38-57, base.py:106-135}
  - MEAD talking-face tuples dataset (target/identity/masked frames, audio
    windows from precomputed wav2vec2 pkls, mouth mask from landmarks[48:68]):
    talking_face/taming/data/custom.py:278-421 (MEADBase3) and :546-692
    (MEADBase5 = +raw landmarks for the lipread loss)
  - Latent caches from compute_latents: face_reenactment/ldm/data/latents.py
  - DataModuleFromConfig/worker seeding: main.py:171-214,155-168

Images are float32 NHWC in [-1, 1] (x/127.5 - 1). Unlike the reference's
hardcoded /gpu-data2 paths, all roots are constructor params.
"""
from __future__ import annotations

import os
import pickle
import threading
import queue as queue_mod
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

EMOTION2LABEL = {
    "angry": 6, "contempt": 7, "disgusted": 5, "fear": 4,
    "happy": 1, "neutral": 0, "sad": 2, "surprised": 3,
}
HUMAN_LABELS = {
    0: "neutral", 1: "happy", 2: "sad", 3: "surprise",
    4: "fear", 5: "disgust", 6: "anger", 7: "contempt",
}


def load_image(path: str, size: Optional[int], random_crop: bool = False,
               rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Resize smallest side to `size`, center/random crop, scale to [-1, 1].

    DSML_NATIVE_IMAGE=1 routes through native/imagepipe.cc (fused
    decode+resize+crop+normalize, GIL released — see data/native_image.py);
    the crop offsets are still drawn HERE with the same rng calls, from the
    library's header-only resized-dims probe, so augmentation streams are
    byte-identical to the PIL path. Any native failure falls back to PIL
    for that file, reusing the already-drawn offsets.
    """
    crop = None  # (x0, y0) in resized coords, shared by both backends
    if size is not None and size > 0:
        from .native_image import enabled, load_image_native, probe_resized

        if enabled():
            if random_crop and rng is not None:
                wh = probe_resized(path, size)
                if wh is not None:
                    w, h = wh
                    crop = (rng.randint(0, w - size + 1),
                            rng.randint(0, h - size + 1))
            arr = load_image_native(path, size, crop)
            if arr is not None:
                return arr
    return _load_image_pil(path, size, random_crop, rng, crop)


def _load_image_pil(path, size, random_crop=False, rng=None, crop=None):
    """The PIL backend — also the direct refill target for files the native
    library rejected (retrying the native decode would just fail again)."""
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    if size is not None and size > 0:
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                         Image.BICUBIC)
        w, h = img.size
        if crop is not None:
            x0, y0 = crop  # drawn by the caller from the (identical) probe dims
        elif random_crop and rng is not None:
            x0 = rng.randint(0, w - size + 1)
            y0 = rng.randint(0, h - size + 1)
        else:
            x0, y0 = (w - size) // 2, (h - size) // 2
        img = img.crop((x0, y0, x0 + size, y0 + size))
    arr = np.asarray(img, dtype=np.uint8)
    return (arr / 127.5 - 1.0).astype(np.float32)


def load_images(paths, size: Optional[int]) -> np.ndarray:
    """Stack of center-cropped frames [N, size, size, 3] in [-1, 1].

    With DSML_NATIVE_IMAGE=1 the whole stack decodes through ONE call into
    the native library's internal thread pool (see native_image.py) —
    the batch counterpart of load_image for single-threaded CLI loops
    (compute_latents, image_metrics, streaming_pipeline); failed rows are
    refilled per file through the PIL fallback."""
    paths = list(paths)
    if size is not None and size > 0 and paths:
        from .native_image import enabled, load_image_batch

        if enabled():
            threads = int(os.environ.get("DSML_NATIVE_IMAGE_THREADS",
                                         str(min(16, os.cpu_count() or 8))))
            out = load_image_batch(paths, size, threads=threads)
            if out is not None:
                imgs, status = out
                for i in np.nonzero(status != 0)[0]:
                    imgs[i] = _load_image_pil(paths[i], size)
                return imgs
    return np.stack([load_image(p, size) for p in paths])


def _load_pickle(path: str):
    if os.path.getsize(path) > 0:
        with open(path, "rb") as f:
            return pickle.load(f)
    return None


class Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError


def _item_rng(seed: int, epoch: int, idx) -> np.random.RandomState:
    """Per-item RandomState: reproducible under the DataLoader's threaded
    __getitem__ (a shared RandomState would consume draws in scheduler
    order), varying by epoch (the loader stamps dataset._epoch)."""
    return np.random.RandomState(
        (seed * 1000003 + epoch * 10007 + int(idx)) % (2**31 - 1)
    )


class AffectnetDataset(Dataset):
    """AffectNet aligned crops; class label = filename prefix `<label>_...jpg`."""

    # reference AffectnetPaths shape-render filenames per model
    # (taming/data/base.py:127-131)
    SHAPE_FILES = {"emoca": "geometry_detail.png",
                   "deca": "shape_detail_images.jpg"}

    def __init__(self, images_list_file: str, size: int = 128,
                 random_crop: bool = False, shape_root: Optional[str] = None,
                 shape_model: str = "emoca", seed: int = 0):
        with open(images_list_file) as f:
            self.paths = [l for l in f.read().splitlines() if l]
        self.size = size
        self.random_crop = random_crop
        self.shape_root = shape_root  # DECA/EMOCA geometry renders (optional)
        assert shape_model in self.SHAPE_FILES, shape_model
        self.shape_model = shape_model
        self.seed = seed

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i) -> Dict:
        path = self.paths[i]
        label = int(os.path.basename(path).split("_")[0])
        rng = _item_rng(self.seed, getattr(self, "_epoch", 0), i)
        ex = {
            "image": load_image(path, self.size, self.random_crop, rng),
            "class_label": np.int32(label),
            "human_label": HUMAN_LABELS[label],
            "file_path": path,
        }
        if self.shape_root is not None:
            name = os.path.splitext(os.path.basename(path))[0]
            # same rescale+crop pipeline as the target (reference
            # AffectnetPaths routes shape_image through preprocess_image,
            # base.py:121-132) — a center-cropped shape render against a
            # random-cropped target would silently shift the conditioning
            ex["shape_image"] = load_image(
                os.path.join(self.shape_root, name,
                             self.SHAPE_FILES[self.shape_model]),
                self.size, self.random_crop, rng,
            )
        return ex


# Reference-config-name aliases (reference ctor params forwarded, not dropped)
def AffectnetTrain(size=128, training_images_list_file=None, model="emoca",
                   random_crop=False, seed=0, **kw):
    return AffectnetDataset(training_images_list_file, size=size,
                            random_crop=random_crop,
                            shape_root=kw.get("shape_root"),
                            shape_model=model, seed=seed)


def AffectnetTest(size=128, test_images_list_file=None, model="emoca",
                  random_crop=False, seed=0, **kw):
    return AffectnetDataset(test_images_list_file, size=size,
                            random_crop=random_crop,
                            shape_root=kw.get("shape_root"),
                            shape_model=model, seed=seed)


class MEADTalkingFace(Dataset):
    """MEADBase3/5-equivalent: (subject, emotion, level, clip) tuples.

    mode='train': one random target frame per clip with identity frame (≤
    max_shortcut ahead of the target's window start), mouth-masked target,
    (2*audio_window+1) audio-feature window, emotion label.
    mode='sample': all frames' masked images + the full audio track for
    progressive video synthesis.
    include_landmarks=True adds raw landmarks (MEADBase5, lipread finetune).
    """

    def __init__(self, tuples_path: str, data_root: str, audio_dir: str,
                 audio_window: int = 8, size: int = 128, mode: str = "train",
                 max_shortcut: int = 60, include_landmarks: bool = False,
                 force_align: bool = False, random_crop: bool = False,
                 seed: int = 0):
        assert mode in ("train", "sample")
        with open(tuples_path, "rb") as f:
            self.tuples = sorted(list(pickle.load(f)))
        self.data_root = data_root
        self.audio_dir = audio_dir
        self.audio_window = audio_window
        self.size = size
        self.mode = mode
        self.max_shortcut = max_shortcut
        self.include_landmarks = include_landmarks
        # sample mode: pin the identity frame to frame 0 (reference
        # force_align, custom.py:355-358)
        self.force_align = force_align
        # reference MEADBase3 builds albumentations.RandomCrop when set
        # (custom.py:303-306); silently dropping the key would change the
        # training distribution of a verbatim reference YAML
        self.random_crop = random_crop
        self.seed = seed
        self._mean_landmarks = None

    def _mean_lm(self):
        """Dataset-mean landmarks, the reference's fallback when a frame's
        landmark pickle is empty (custom.py:367, mean_landmarks.pkl)."""
        if self._mean_landmarks is None:
            p = os.path.join(self.data_root, "mean_landmarks.pkl")
            self._mean_landmarks = (
                np.asarray(_load_pickle(p), np.float32) if os.path.exists(p)
                else np.full((68, 2), self.size / 2, np.float32)
            )
        return self._mean_landmarks

    def __len__(self):
        return len(self.tuples)

    def _clip_dir(self, subj, emotion, lvl, nbr):
        return os.path.join(self.data_root, subj, "video", "front", emotion, lvl, nbr)

    def _landmarks_dir(self, subj, emotion, lvl, nbr):
        return os.path.join(self.data_root, subj, "landmarks", "front", emotion, lvl, nbr)

    def _mask_mouth(self, image: np.ndarray, landmarks):
        """Mask everything below the mouth top; returns (masked image,
        normalized non-mouth landmarks[0:48] raveled) — custom.py:360-371."""
        masked = image.copy()
        if landmarks is not None:
            mouth = landmarks[48:68]
            min_y = int(np.min(mouth[:, 1])) - 5
        else:
            landmarks = self._mean_lm()
            min_y = self.size // 2  # reference hardcodes 64 at size 128
        # negative min_y keeps Python slicing semantics (mask only the last
        # |min_y| rows), exactly like the reference's unclamped index
        # (custom.py:373) — clamping to 0 would blank the whole frame
        masked[min_y:, :, :] = -1.0
        mlm = np.clip(np.asarray(landmarks[0:48], np.float32), 0, self.size)
        mlm = mlm / (self.size / 2) - 1.0
        return masked, mlm.ravel()

    def _audio_window_at(self, audio_features: np.ndarray, t: int) -> np.ndarray:
        n = len(audio_features)
        idx = [min(max(t + i, 0), n - 1)
               for i in range(-self.audio_window, self.audio_window + 1)]
        return audio_features[idx]

    def __getitem__(self, idx) -> Dict:
        subj, emotion, lvl, nbr = self.tuples[idx]
        clip_dir = self._clip_dir(subj, emotion, lvl, nbr)
        lm_dir = self._landmarks_dir(subj, emotion, lvl, nbr)
        audio = _load_pickle(
            os.path.join(self.audio_dir, f"{subj}_{emotion}_{lvl}_{nbr}.pkl")
        )
        frames = sorted(os.listdir(clip_dir))
        n = len(frames)

        def lm(k):
            # _load_pickle semantics mirror the reference exactly
            # (custom.py:364): a MISSING pickle raises FileNotFoundError (a
            # never-generated landmarks tree must not silently train every
            # item on mean landmarks); an EMPTY file returns None, which
            # _mask_mouth turns into the mean-landmark fallback
            return _load_pickle(
                os.path.join(lm_dir, frames[k].replace("jpg", "pkl")))

        if audio is None:
            raise ValueError(
                f"empty audio features for {subj}/{emotion}/{lvl}/{nbr} — "
                "regenerate with scripts/mead_audio_features.py")
        audio = np.asarray(audio)
        # reference invariant (custom.py:343): one audio row per frame; a
        # truncated pickle would silently condition frames on wrong rows
        assert n == audio.shape[0], (
            f"{subj}/{emotion}/{lvl}/{nbr}: {n} frames but "
            f"{audio.shape[0]} audio feature rows")

        rng = _item_rng(self.seed, getattr(self, "_epoch", 0), idx)
        anchor = rng.randint(n) if self.mode == "train" else 0
        if self.mode == "sample" and self.force_align:
            id_idx = 0
        else:
            id_idx = rng.randint(min(n, anchor + self.max_shortcut))
        if self.mode == "sample" and not self.random_crop:
            # every frame is decoded anyway: one batched call rides the
            # native thread pool instead of n sequential decodes
            all_imgs = load_images(
                [os.path.join(clip_dir, f) for f in frames], self.size)
            image, identity = all_imgs[anchor], all_imgs[id_idx]
        else:
            all_imgs = None
            image = load_image(os.path.join(clip_dir, frames[anchor]),
                               self.size, self.random_crop, rng)
            identity = load_image(os.path.join(clip_dir, frames[id_idx]),
                                  self.size, self.random_crop, rng)

        ex: Dict = {
            "image": image,
            "identity": identity,
            "class_label": np.int32(EMOTION2LABEL[emotion]),
            "human_label": emotion,
            "frame_idx": np.int32(anchor),
            "num_frames": np.int32(n),
            "subj": subj, "lvl": lvl, "nbr": nbr,
        }
        ex["identity_idx"] = np.int32(id_idx)
        if self.mode == "train":
            landmarks = lm(anchor)
            ex["masked_image"], ex["masked_landmarks"] = self._mask_mouth(
                image, landmarks
            )
            ex["audio"] = self._audio_window_at(audio, anchor).astype(
                np.float32
            )
            if self.include_landmarks:
                ex["landmarks"] = np.asarray(
                    landmarks if landmarks is not None else self._mean_lm(),
                    dtype=np.float32,
                )
        else:
            masked, mlms, lms = [], [], []
            for k in range(n):
                img_k = (all_imgs[k] if all_imgs is not None else load_image(
                    os.path.join(clip_dir, frames[k]), self.size,
                    self.random_crop, rng))
                landmarks = lm(k)
                m, mlm = self._mask_mouth(img_k, landmarks)
                masked.append(m)
                mlms.append(mlm)
                lms.append(np.asarray(
                    landmarks if landmarks is not None else self._mean_lm(),
                    dtype=np.float32,
                ))
            ex["masked_image"] = np.stack(masked)
            ex["masked_landmarks"] = np.stack(mlms)
            ex["audio"] = np.asarray(audio, dtype=np.float32)
            if self.include_landmarks:
                ex["landmarks"] = np.stack(lms)
        return ex


def MEADBase3(audio_window, size=128, tuples_path=None, mode="train",
              data_root=None, audio_dir=None, force_align=False,
              random_crop=False, seed=0, **kw):
    return MEADTalkingFace(tuples_path, data_root, audio_dir,
                           audio_window=audio_window, size=size, mode=mode,
                           force_align=force_align, random_crop=random_crop,
                           seed=seed, max_shortcut=kw.get("max_shortcut", 60))


def MEADBase5(audio_window, size=128, tuples_path=None, mode="train",
              data_root=None, audio_dir=None, force_align=False,
              random_crop=False, seed=0, **kw):
    return MEADTalkingFace(tuples_path, data_root, audio_dir,
                           audio_window=audio_window, size=size, mode=mode,
                           force_align=force_align, include_landmarks=True,
                           random_crop=random_crop, seed=seed,
                           max_shortcut=kw.get("max_shortcut", 60))


class LatentDataset(Dataset):
    """compute_latents npy caches: DDIM-inverted latents + origin images, for
    CLIP finetuning / tuned manipulation (ldm/data/latents.py:8-87).

    Origin images arrive in [0, 1] float and are rescaled to [-1, 1]; latents
    are used as-is. `n_samples` takes a random subset like the reference.
    """

    def __init__(self, precomputed_latents_path: str, origin_path: str,
                 files_path: Optional[str] = None, n_samples: Optional[int] = None,
                 size: Optional[int] = None, seed: int = 0):
        self.latents = np.load(precomputed_latents_path)
        self.origin = np.load(origin_path)
        self.fp = np.load(files_path) if files_path is not None else None
        self.size = size
        idx = np.arange(len(self.latents))
        if n_samples is not None and n_samples < len(idx):
            idx = np.random.RandomState(seed).choice(idx, n_samples, replace=False)
        self.idx = idx

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i) -> Dict:
        j = int(self.idx[i])
        origin = np.asarray(self.origin[j], dtype=np.float32)
        # reference LatentBase.preprocess_image (ldm/data/latents.py:26-29):
        # uint8 quantize -> smallest-side resize -> center crop -> [-1, 1]
        u8 = (origin * 255.0).astype(np.uint8)
        if self.size is not None and Image is not None:
            h, w = u8.shape[:2]
            if min(h, w) != self.size or h != w:
                s = self.size / min(h, w)
                img = Image.fromarray(u8).resize(
                    (max(self.size, int(round(w * s))),
                     max(self.size, int(round(h * s)))),
                    Image.BILINEAR,
                )
                u8 = np.asarray(img)
                h, w = u8.shape[:2]
                top, left = (h - self.size) // 2, (w - self.size) // 2
                u8 = u8[top:top + self.size, left:left + self.size]
        origin = (u8.astype(np.float32) / 127.5 - 1.0)
        ex = {
            "latent": np.asarray(self.latents[j], dtype=np.float32),
            "original": origin,
        }
        if self.fp is not None:
            path = str(self.fp[j])
            ex["file_path"] = path
            ex["class_label"] = np.int32(os.path.basename(path).split("_")[0])
        return ex


def LatentTrain(training_precomputed_latents_path=None, training_origin_path=None,
                training_files_path=None, n_samples=None, size=None, seed=0,
                **kw):
    return LatentDataset(training_precomputed_latents_path, training_origin_path,
                         training_files_path, n_samples, size, seed=seed)


def LatentTest(test_precomputed_latents_path=None, test_origin_path=None,
               test_files_path=None, n_samples=None, size=None, seed=0, **kw):
    return LatentDataset(test_precomputed_latents_path, test_origin_path,
                         test_files_path, n_samples, size, seed=seed)


class SyntheticDataset(Dataset):
    """Random tensors with a given spec — for tests/benchmarks without data."""

    def __init__(self, spec: Dict[str, tuple], length: int = 64, seed: int = 0):
        self.spec = spec
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i) -> Dict:
        rng = np.random.RandomState(self.seed + i)
        out = {}
        for k, (shape, dtype) in self.spec.items():
            if np.issubdtype(np.dtype(dtype), np.integer):
                out[k] = rng.randint(0, 8, size=shape).astype(dtype)
            else:
                out[k] = rng.randn(*shape).astype(dtype)
        return out


def collate(examples: List[Dict]) -> Dict:
    """Stack array fields; keep str fields as lists."""
    out = {}
    for k in examples[0]:
        vals = [e[k] for e in examples]
        if isinstance(vals[0], (np.ndarray, np.integer, np.floating, int, float)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


class DataLoader:
    """Minimal threaded loader: shuffling, batching, prefetch.

    Replaces main.DataModuleFromConfig/DataLoader(num_workers) — TPU input
    pipelines are host-threaded here (JPEG decode releases the GIL in PIL).
    """

    def __init__(self, dataset: Dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4, seed: int = 123,
                 prefetch: int = 2, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # Multi-host: batch_size is the GLOBAL batch; every process walks the
        # same seeded permutation and takes a disjoint batch_size/process_count
        # slice of each batch (replaces the reference's DistributedSampler).
        if process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        if process_index is None:
            process_index = 0
        assert 0 <= process_index < process_count
        assert batch_size % process_count == 0, (
            f"global batch_size {batch_size} must divide evenly over "
            f"{process_count} processes"
        )
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self.process_count > 1:
            # multi-process always drops the ragged tail (see _batches)
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        end = len(idx) - (len(idx) % self.batch_size if self.drop_last else 0)
        per = self.batch_size // self.process_count
        for s in range(0, end, self.batch_size):
            b = idx[s:s + self.batch_size]
            if len(b) < self.batch_size and self.process_count > 1:
                break  # a ragged tail cannot shard evenly across processes
            yield b[self.process_index * per:(self.process_index + 1) * per]

    def __iter__(self):
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        # per-item randomness (augmentations, MEAD anchor draws) keys off
        # (dataset.seed, epoch, index) — stamp the epoch before workers start
        self.dataset._epoch = self.epoch
        batches = list(self._batches())
        self.epoch += 1

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        if not put(collate(list(
                            pool.map(self.dataset.__getitem__, b)
                        ))):
                            return
            except BaseException as e:  # surface to the consumer; a dead
                put(e)                  # producer would hang q.get() forever
                return
            put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer stopped early (break / max_batches): release the
            # producer so its thread + pool + prefetched batches don't leak
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass

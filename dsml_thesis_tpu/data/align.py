"""Face alignment / cropping preprocessing (numpy + PIL, detector-agnostic).

Parity targets:
  - FaceAligner eye-based affine alignment + AffectNet crop pipeline:
    face_reenactment/align/align.py:48-313 (desired eye positions, rotation +
    scale from the inter-ocular vector, label-prefixed output names)
  - MEAD mouth-mask + mouth-ROI crops: talking_face/scripts/{mask,crop_mouth}.py

Landmark DETECTION is an external step (the reference uses FAN/dlib/MTCNN,
whose pretrained detectors are not shippable here); these functions consume
68-point landmarks from any detector and perform the geometry.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

LEFT_EYE = slice(36, 42)
RIGHT_EYE = slice(42, 48)
MOUTH = slice(48, 68)


def eye_centers(landmarks: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return landmarks[LEFT_EYE].mean(axis=0), landmarks[RIGHT_EYE].mean(axis=0)


def alignment_transform(
    landmarks: np.ndarray,
    output_size: int = 224,
    desired_left_eye: Tuple[float, float] = (0.35, 0.35),
) -> np.ndarray:
    """2x3 affine matrix rotating/scaling so the eyes land at canonical spots."""
    left, right = eye_centers(landmarks)
    d = right - left
    angle = np.arctan2(d[1], d[0])
    dist = np.hypot(*d)
    desired_right_x = 1.0 - desired_left_eye[0]
    desired_dist = (desired_right_x - desired_left_eye[0]) * output_size
    scale = desired_dist / max(dist, 1e-6)

    center = (left + right) / 2.0
    cos, sin = np.cos(angle), np.sin(angle)
    # rotate by -angle, scale, then translate eye midpoint to its target
    m = np.array([
        [scale * cos, scale * sin, 0.0],
        [-scale * sin, scale * cos, 0.0],
    ])
    target = np.array([output_size * 0.5,
                       output_size * desired_left_eye[1]])
    m[:, 2] = target - m[:, :2] @ center
    return m


def warp_affine(image: np.ndarray, m: np.ndarray, output_size: int) -> np.ndarray:
    """Apply a forward 2x3 affine via PIL's inverse-map interface."""
    from PIL import Image

    full = np.vstack([m, [0, 0, 1]])
    inv = np.linalg.inv(full)
    img = Image.fromarray(image)
    out = img.transform(
        (output_size, output_size), Image.AFFINE,
        data=inv[:2].ravel().tolist(), resample=Image.BILINEAR,
    )
    return np.asarray(out)


def align_face(
    image: np.ndarray, landmarks: np.ndarray, output_size: int = 224,
    desired_left_eye: Tuple[float, float] = (0.35, 0.35),
) -> np.ndarray:
    """Eye-aligned square crop (uint8 HWC in, uint8 out)."""
    m = alignment_transform(landmarks, output_size, desired_left_eye)
    return warp_affine(image, m, output_size)


def reference_eye_rotation(image: np.ndarray, landmarks: np.ndarray) -> np.ndarray:
    """The reference FaceAligner.align (align/align.py:65-147), exactly.

    Rotation-only (scale 1, no translation) about the eye midpoint with
    reflect padding, replicating two reference quirks bit-for-bit:
      - its landmark table swaps eyes (right_eye = 36:42, left_eye = 42:48,
        align.py:23-31), so `angle - 180` lands near 0 for upright faces;
      - the cv2-convention (x, y) rotation matrix is fed to scipy's
        affine_transform, which interprets it over (row=y, col=x) indices as
        an output→input map.
    Output keeps the input size (the desiredFaceWidth crop is dead code —
    the translation that would use it is commented out upstream).
    """
    import scipy.ndimage

    left = landmarks[42:48].mean(axis=0).astype(int)    # "left_eye" 42:48
    right = landmarks[36:42].mean(axis=0).astype(int)   # "right_eye" 36:42
    angle = np.degrees(np.arctan2(right[1] - left[1],
                                  right[0] - left[0])) - 180.0
    cx = (left[0] + right[0]) // 2
    cy = (left[1] + right[1]) // 2
    a = np.cos(np.radians(angle))
    b = np.sin(np.radians(angle))
    # cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
    m2 = np.array([[a, b, (1 - a) * cx - b * cy],
                   [-b, a, b * cx + (1 - a) * cy]])
    matrix = np.zeros((3, 3), m2.dtype)
    matrix[:2, :2] = m2[:, :2]
    matrix[2, 2] = 1.0
    offset = np.zeros(3, m2.dtype)
    offset[:2] = m2[:, 2]
    return scipy.ndimage.affine_transform(image, matrix, offset, mode="reflect")


def affectnet_square_crop(image: np.ndarray, bbox) -> np.ndarray:
    """The AffectNet detector-box squaring crop (align.py:271-284): extend the
    SHORTER side one-sidedly (start clamped at 0, end over-extended)."""
    x1, y1, x2, y2 = [max(int(v), 0) for v in bbox]
    w, h = x2 - x1, y2 - y1
    offset = (max(w, h) - min(w, h)) // 2
    if w < h:
        x1 = max(x1 - offset, 0)
        return image[y1:y2, x1:x2 + offset]
    if w > h:
        y1 = max(y1 - offset, 0)
        return image[y1:y2 + offset, x1:x2]
    return image[y1:y2, x1:x2]


def mask_mouth_region(image_m11: np.ndarray, landmarks: np.ndarray,
                      margin: int = 5) -> np.ndarray:
    """Blank everything below the mouth's top edge (MEAD masking rule).

    Deliberately UNCLAMPED slice start, matching the train-time mask
    (datasets.MEADTalkingFace._mask_mouth and the reference custom.py:373):
    a negative min_y masks only the last |min_y| rows. Clamping to 0 would
    blank the whole frame, so offline-preprocessed masks would diverge from
    the masks training computes."""
    masked = image_m11.copy()
    min_y = int(np.min(landmarks[MOUTH, 1])) - margin
    masked[min_y:, :, :] = -1.0
    return masked


def crop_mouth_roi(image: np.ndarray, landmarks: np.ndarray,
                   crop: int = 72) -> np.ndarray:
    """Square crop centered on the mouth centroid, clamped to bounds.

    Default 72px matches the reference lipread-eval mouth crops
    (talking_face/scripts/crop_mouth.py:38, _crop_height/_crop_width=72) —
    AV-HuBERT WER numbers are only comparable at the reference framing."""
    h, w = image.shape[:2]
    assert h >= crop and w >= crop, (
        f"image {h}x{w} smaller than mouth crop {crop}"
    )
    cx, cy = landmarks[MOUTH].mean(axis=0)
    cx = int(np.clip(round(cx), crop // 2, w - crop // 2))
    cy = int(np.clip(round(cy), crop // 2, h - crop // 2))
    return image[cy - crop // 2: cy + crop // 2, cx - crop // 2: cx + crop // 2]

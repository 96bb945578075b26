"""align_face crop arithmetic vs a direct port of the reference's
align_mtcnn (main_end2end_module2.py:12-45)."""
import numpy as np

from animateportrait_tpu.pipeline.align import align_face


def _ref_align(img, faces, out_size=512):
    import cv2

    height, width, _ = img.shape
    maxs = 0
    out = None
    for face in faces:
        x1, y1, x2, y2 = face[:4]
        w = x2 - x1 + 1
        h = y2 - y1 + 1
        size = int(min([w, h]) * 1.2)
        cx = x1 + w // 2
        cy = y1 + h // 2
        if size > maxs:
            size1 = int(round(size / 0.7))
            x11 = int(cx - size1 // 2)
            x21 = x11 + size1
            y11 = int(cy - (size1 * 11) // 20)
            y21 = y11 + size1
            maxs = size
            cropped2 = np.ones((size1, size1, 3), np.uint8) * 255
            cropped2[max(0, y11) - y11:min(y21, height) - y11,
                     max(0, x11) - x11:min(width, x21) - x11] = \
                img[max(0, y11):min(y21, height),
                    max(0, x11):min(width, x21)]
            out = cv2.resize(cropped2, (out_size, out_size),
                             interpolation=cv2.INTER_CUBIC)
    return out


def test_align_face_matches_reference_crop():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (300, 260, 3)).astype(np.uint8)
    # float boxes like MTCNN emits, incl. one partially out of frame
    cases = [
        np.array([[80.3, 90.7, 190.2, 220.9, 0.99]]),
        np.array([[10.0, 5.0, 120.0, 140.0, 0.9],
                  [30.5, 40.5, 250.1, 280.4, 0.99]]),   # bigger 2nd face
        np.array([[-20.0, -10.0, 150.0, 170.0, 0.8]]),  # crosses border
    ]
    for boxes in cases:
        ours, _affine, _idx = align_face(img, boxes)
        ref = _ref_align(img, boxes)
        np.testing.assert_array_equal(ours, ref)

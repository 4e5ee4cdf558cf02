"""Self-contained image ops (no cv2/PIL in the production path).

- ``jpeg``: baseline JFIF encoder (the reference streams webcam frames as
  JPEG via ``cv2.imencode('.jpg', frame)``, camera/camera.py:117-121)
- ``draw``: rectangle/text annotation primitives (the reference's
  ``cv2.rectangle``/``cv2.putText`` overlay, camera/camera.py:104-110)
"""

from melogan_tpu.imaging.jpeg import encode_jpeg
from melogan_tpu.imaging.draw import draw_rect, draw_text

__all__ = ["encode_jpeg", "draw_rect", "draw_text"]

"""Image sequence readers — parity with reference
``utils/crop_as_in_dataset.py:424-560`` (folder / video / single image)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from pathlib import Path


IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


class ImageReader(ABC):
    @abstractmethod
    def __len__(self):
        ...

    @abstractmethod
    def __next__(self):
        """Returns (rgb uint8 image, name stem)."""

    def __iter__(self):
        return self

    @staticmethod
    def get_image_reader(source):
        source = Path(source)
        if source.is_dir():
            return FolderReader(source)
        if source.suffix.lower() in IMAGE_EXTENSIONS:
            return SingleImageReader(source)
        return VideoReader(source)


class FolderReader(ImageReader):
    def __init__(self, path):
        self.files = sorted(p for p in Path(path).iterdir()
                            if p.suffix.lower() in IMAGE_EXTENSIONS)
        self.idx = 0

    def __len__(self):
        return len(self.files)

    def __next__(self):
        import cv2
        if self.idx >= len(self.files):
            raise StopIteration
        p = self.files[self.idx]
        self.idx += 1
        img = cv2.imread(str(p))
        if img is None:
            raise IOError(f"Couldn't read {p}")
        return img[..., ::-1].copy(), p.stem


class VideoReader(ImageReader):
    def __init__(self, path):
        import cv2
        self.cap = cv2.VideoCapture(str(path))
        self.length = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.idx = 0

    def __len__(self):
        return max(self.length, 0)

    def __next__(self):
        ok, img = self.cap.read()
        if not ok:
            self.cap.release()
            raise StopIteration
        name = f"{self.idx:06d}"
        self.idx += 1
        return img[..., ::-1].copy(), name


class SingleImageReader(ImageReader):
    def __init__(self, path):
        self.path = Path(path)
        self.done = False

    def __len__(self):
        return 1

    def __next__(self):
        import cv2
        if self.done:
            raise StopIteration
        self.done = True
        img = cv2.imread(str(self.path))
        return img[..., ::-1].copy(), self.path.stem

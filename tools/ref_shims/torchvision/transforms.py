"""Functional mini-torchvision.transforms shim — exactly the surface
the reference's radiology extractor composes
(ref feature_extraction.py:103-108: ToPILImage -> CenterCrop(224) ->
ToTensor -> Normalize), with torchvision's semantics for the input it
actually feeds (a 3xHxW float tensor in [0, 1]):

  * ToPILImage quantizes float tensors via mul(255).byte() to an RGB
    PIL image (torchvision F.to_pil_image);
  * CenterCrop PADS with zeros when the image is smaller than the crop
    (torchvision F.center_crop's padding_ltrb branch), floor-left /
    ceil-right;
  * ToTensor returns float32 CHW in [0, 1];
  * Normalize is per-channel (x - mean) / std.
"""
import numpy as np
import torch


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToPILImage:
    def __init__(self, mode=None):
        self.mode = mode

    def __call__(self, pic):
        from PIL import Image
        if isinstance(pic, torch.Tensor):
            if pic.is_floating_point():
                pic = pic.mul(255).byte()
            npimg = np.transpose(pic.cpu().numpy(), (1, 2, 0))
        else:
            npimg = np.asarray(pic)
        if npimg.shape[2] == 1:
            return Image.fromarray(npimg[:, :, 0], mode="L")
        return Image.fromarray(npimg, mode="RGB")


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        from PIL import ImageOps
        ch, cw = self.size
        w, h = img.size
        if cw > w or ch > h:
            # torchvision pads fill=0: (left, top, right, bottom)
            ltrb = ((cw - w) // 2 if cw > w else 0,
                    (ch - h) // 2 if ch > h else 0,
                    (cw - w + 1) // 2 if cw > w else 0,
                    (ch - h + 1) // 2 if ch > h else 0)
            img = ImageOps.expand(img, border=ltrb, fill=0)
            w, h = img.size
            if cw == w and ch == h:
                return img
        top = int(round((h - ch) / 2.0))
        left = int(round((w - cw) / 2.0))
        return img.crop((left, top, left + cw, top + ch))


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
        return t.float().div(255.0)


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
        self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

    def __call__(self, t):
        return (t - self.mean) / self.std


class Resize:
    """Imported by some reference paths but unused on the parity runs."""

    def __init__(self, *a, **k):
        raise NotImplementedError("Resize is not part of the shim")

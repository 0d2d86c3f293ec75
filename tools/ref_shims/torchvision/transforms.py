def _unavailable(*a, **k):
    raise NotImplementedError("torchvision shim: transforms unavailable")


class _Stub:
    def __init__(self, *a, **k):
        raise NotImplementedError("torchvision shim: transforms unavailable")


Compose = ToTensor = Normalize = CenterCrop = Resize = _Stub

"""Utilities for loading the *reference* PyTorch model code as a test oracle.

The reference imports timm, which is not installed; we stub the handful of timm
symbols it uses (trunc_normal_, DropPath, registry plumbing) and import the reference
modules directly from /root/reference so golden-parity tests compare against the real
thing rather than a re-implementation. Nothing from the reference is copied into the
repo — it is only imported read-only at test time.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn

REF = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules and getattr(sys.modules["timm"], "_recnext_stub", False):
        return
    timm = types.ModuleType("timm")
    timm._recnext_stub = True
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0], 1, 1, 1), keep, device=x.device))
            return x * mask / keep

    def register_model(fn):
        return fn

    def create_model(name, **kwargs):
        raise NotImplementedError("use the registered fns directly in tests")

    def build_model_with_cfg(cls, variant, pretrained, feature_cfg=None, **kwargs):
        kwargs.pop("pretrained_cfg", None)
        return cls(**kwargs)

    def generate_default_cfgs(cfgs):
        return cfgs

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    models.register_model = register_model
    models.create_model = create_model
    models.build_model_with_cfg = build_model_with_cfg
    models.generate_default_cfgs = generate_default_cfgs
    # timm.models.layers (old-style path used by the mlla files)
    models_layers = types.ModuleType("timm.models.layers")
    models_layers.DropPath = DropPath
    models_layers.to_2tuple = to_2tuple
    models_layers.trunc_normal_ = trunc_normal_
    models.layers = models_layers
    models.__path__ = []  # mark as package so 'timm.models.layers' imports resolve
    timm.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = models_layers


def load_ref_module(rel_path: str, name: str):
    """Import a reference file (e.g. 'model/recnext.py') with the timm stub active."""
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel_path}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def to_nhwc(x: torch.Tensor):
    return x.detach().permute(0, 2, 3, 1).contiguous().numpy()


def to_nchw_tensor(x_nhwc) -> torch.Tensor:
    import numpy as np

    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _install_torchvision_stub():
    """A faithful minimal torchvision so the REFERENCE's eval data pipeline
    (/root/reference/data/datasets.py:102-140 + fuse_eval.py/main.py --eval)
    runs in this environment (torchvision is not installed; zero egress).

    Every transform delegates the pixel math to PIL exactly the way torchvision
    does (Resize: short side to `size`, long side int-truncated, PIL resample
    code; CenterCrop/ToTensor/Normalize: the documented arithmetic), so the
    cross-harness eval test pins the real seams — resize/crop arithmetic, class
    mapping, label order, accuracy computation — with PIL as the shared pixel
    engine on both sides."""
    if "torchvision" in sys.modules and getattr(
            sys.modules["torchvision"], "_recnext_stub", False):
        return
    import numpy as np
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tv._recnext_stub = True
    tfm = types.ModuleType("torchvision.transforms")
    dsets = types.ModuleType("torchvision.datasets")
    folder = types.ModuleType("torchvision.datasets.folder")

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    class Resize:
        """torchvision semantics: int size -> short side to size, long side
        int(size * long / short); tuple -> exact. interpolation 3 == PIL BICUBIC."""

        def __init__(self, size, interpolation=2):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            if isinstance(self.size, (tuple, list)):
                oh, ow = self.size
            else:
                # torchvision _compute_resized_output_size (functional.py):
                #   new_short = size; new_long = int(size * long / short)
                # (int-TRUNCATION, not round)
                w, h = img.size
                if w <= h:
                    ow, oh = self.size, int(self.size * h / w)
                else:
                    oh, ow = self.size, int(self.size * w / h)
            if (ow, oh) == img.size:
                # torchvision F.resize: "if [image_height, image_width] ==
                # output_size: return img" — a same-size bicubic PIL resample
                # is NOT the identity, so this short-circuit is load-bearing
                return img
            return img.resize((ow, oh), self.interpolation)

    class CenterCrop:
        def __init__(self, size):
            self.size = size if isinstance(size, (tuple, list)) else (size, size)

        def __call__(self, img):
            w, h = img.size
            th, tw = self.size
            x = int(round((w - tw) / 2.0))
            y = int(round((h - th) / 2.0))
            return img.crop((x, y, x + tw, y + th))

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr).permute(2, 0, 1).contiguous().float().div(255.0)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class RandomCrop:  # referenced by build_transform's small-image branch only
        def __init__(self, size, padding=0):
            self.size, self.padding = size, padding

        def __call__(self, img):
            raise NotImplementedError("train-path transform; eval tests only")

    def default_loader(path):
        with open(path, "rb") as f:
            return Image.open(f).convert("RGB")

    class ImageFolder(torch.utils.data.Dataset):
        """torchvision ImageFolder semantics: classes = sorted subdir names,
        samples sorted per class, targets = class index."""

        def __init__(self, root, transform=None, target_transform=None,
                     loader=default_loader):
            import os

            self.root = root
            self.transform = transform
            self.target_transform = target_transform
            self.loader = loader
            self.classes = sorted(d.name for d in os.scandir(root) if d.is_dir())
            self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
            self.samples = []
            for c in self.classes:
                cdir = os.path.join(root, c)
                for fname in sorted(os.listdir(cdir)):
                    self.samples.append((os.path.join(cdir, fname),
                                         self.class_to_idx[c]))
            self.imgs = self.samples

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            path, target = self.samples[i]
            img = self.loader(path)
            if self.transform is not None:
                img = self.transform(img)
            if self.target_transform is not None:
                target = self.target_transform(target)
            return img, target

    for name, obj in [("Compose", Compose), ("Resize", Resize),
                      ("CenterCrop", CenterCrop), ("ToTensor", ToTensor),
                      ("Normalize", Normalize), ("RandomCrop", RandomCrop)]:
        setattr(tfm, name, obj)
    folder.ImageFolder = ImageFolder
    folder.default_loader = default_loader
    dsets.ImageFolder = ImageFolder
    dsets.folder = folder
    dsets.__path__ = []
    tv.transforms = tfm
    tv.datasets = dsets
    tv.__path__ = []
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tfm
    sys.modules["torchvision.datasets"] = dsets
    sys.modules["torchvision.datasets.folder"] = folder


def _install_timm_data_stub():
    """timm.data / timm.utils symbols the reference's datasets.py + engine.py
    import at module level. The eval path exercises only the IMAGENET constants
    and `accuracy` (implemented with timm's exact top-k semantics,
    timm/utils/metrics.py); train-only symbols raise if touched."""
    _install_timm_stub()
    timm = sys.modules["timm"]
    data = types.ModuleType("timm.data")
    constants = types.ModuleType("timm.data.constants")
    utils_mod = types.ModuleType("timm.utils")

    constants.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    constants.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    def create_transform(*a, **k):
        raise NotImplementedError("train-path transform; eval tests only")

    class Mixup:
        def __init__(self, *a, **k):
            raise NotImplementedError("train-path; eval tests only")

    class TimmDatasetTar:
        def __init__(self, *a, **k):
            raise NotImplementedError("tar datasets; eval tests only")

    def accuracy(output, target, topk=(1,)):
        # timm.utils.metrics.accuracy, verbatim semantics
        maxk = min(max(topk), output.size(1))
        batch_size = target.size(0)
        _, pred = output.topk(maxk, 1, True, True)
        pred = pred.t()
        correct = pred.eq(target.reshape(1, -1).expand_as(pred))
        return [correct[:min(k, maxk)].reshape(-1).float().sum(0)
                * 100.0 / batch_size for k in topk]

    class ModelEma:
        def __init__(self, *a, **k):
            raise NotImplementedError("train-path; eval tests only")

    data.create_transform = create_transform
    data.Mixup = Mixup
    data.TimmDatasetTar = TimmDatasetTar
    data.ImageDataset = TimmDatasetTar
    data.constants = constants
    data.__path__ = []
    utils_mod.accuracy = accuracy
    utils_mod.ModelEma = ModelEma
    timm.data = data
    timm.utils = utils_mod
    sys.modules["timm.data"] = data
    sys.modules["timm.data.constants"] = constants
    sys.modules["timm.utils"] = utils_mod


def load_ref_eval_harness():
    """Import the reference's eval stack — data.datasets.build_dataset and
    engine.evaluate — as real modules (read-only), with the torchvision/timm
    stubs installed. Returns (build_dataset, evaluate)."""
    _install_torchvision_stub()
    _install_timm_data_stub()
    # the reference's intra-package imports are top-level ('from data.datasets
    # import ...', 'import utils'), so load its files in dependency order under
    # their own names
    import os

    sys.path.insert(0, REF)
    try:
        datasets_mod = load_ref_module("data/datasets.py", "ref_data_datasets")
        # engine imports `from losses import DistillationLoss` and `import utils`
        load_ref_module("losses.py", "losses")
        load_ref_module("utils.py", "utils")
        engine = load_ref_module("engine.py", "ref_engine")
    finally:
        sys.path.remove(REF)
        # engine already holds its references; don't leave bare 'utils'/'losses'
        # names shadowing anything for later tests in the same process
        sys.modules.pop("losses", None)
        sys.modules.pop("utils", None)
    return datasets_mod.build_dataset, engine.evaluate

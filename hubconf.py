"""Hub-style entry points (reference hubconf.py:21-104 surface).

The reference exposes these through torch.hub; here they are plain
importable callables:

    from hubconf import pretrained_r2dm
    ddpm, lidar_utils, cfg = pretrained_r2dm("r2dm-h-kitti360-300k",
                                             ckpt_path=".../weights.pth")
    x = ddpm.sample(batch_size=1, num_steps=256)          # (1, 2, 64, 1024)
    depth = lidar_utils.revert_depth(lidar_utils.denormalize(x[:, [0]]))
    xyz = lidar_utils.to_xyz(depth)
"""

from r2dm_tpu.inference import pretrained_r2dm, setup_model  # noqa: F401
from r2dm_tpu.metrics.extractor.postprocess import (  # noqa: F401
    CRFRNN as crf_rnn_cls,
    knn_filter,
)
from r2dm_tpu.metrics.extractor.rangenet import (  # noqa: F401
    rangenet21,
    rangenet53,
)


def rangenet(weights_tar=None, backbone: int = 53, **kwargs):
    """Reference `rangenet` hub alias (hubconf.py:45-60)."""
    if backbone == 53:
        return rangenet53(weights_tar, **kwargs)
    return rangenet21(weights_tar, **kwargs)


def knn(num_classes: int, **kwargs):
    """kNN post-processor factory (reference hubconf.py:615-618)."""
    from functools import partial

    return partial(knn_filter, num_classes=num_classes, **kwargs)


def crf_rnn(num_classes: int, **kwargs):
    """CRF-RNN post-processor factory (reference hubconf.py:621-624)."""
    return crf_rnn_cls(num_classes=num_classes, **kwargs)

"""ResNet-9 audio tower (GDT ``AudioBaseNetwork("resnet9")`` equivalent,
consumed by the reference at ``model/model.py:408-438`` and
``scripts/get_audio_embeddings.py:30-39``).

A torchvision-style ResNet with BasicBlock x [1,1,1,1] over single-channel
log-spectrograms [b, 1, 257, 199] -> 512-d embeddings (fc replaced by
identity, as the reference does). Conv2Ds map onto the MXU via XLA; the whole
tower jits into one program.

``import_gdt_audio_weights`` maps a GDT ``gdt_IG65M.pth`` checkpoint's
``audio_network.*`` keys into this module's params.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..models.layers import TorchBatchNorm


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn2",
        )(y)
        if self.stride != 1 or residual.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class AudioResNet9(nn.Module):
    """[b, 1, 257, 199] (NCHW like the reference) -> [b, 512]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.moveaxis(x.astype(self.dtype), 1, -1)  # NCHW -> NHWC
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (features, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)]
        ):
            x = BasicBlock(
                features, stride, dtype=self.dtype, name=f"layer{i + 1}_0"
            )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool
        return x.astype(jnp.float32)


def import_gdt_audio_weights(state_dict) -> dict:
    """GDT checkpoint ``audio_network.base.*`` torch keys -> AudioResNet9
    params/batch_stats. Conv weights OIHW -> HWIO; BN -> scale/bias + stats."""

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    sd = {
        (k.split("audio_network.")[1] if "audio_network." in k else k): v
        for k, v in state_dict.items()
        if "audio" in k or k.startswith("base.")
    }

    def conv(key):
        return _np(sd[key]).transpose(2, 3, 1, 0)

    def bn(prefix):
        return (
            {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])},
        )

    params = {"conv1": {"kernel": conv("base.conv1.weight")}}
    stats = {}
    params["bn1"], stats["bn1"] = bn("base.bn1")
    for i in range(1, 5):
        blk = f"base.layer{i}.0"
        name = f"layer{i}_0"
        p = {
            "conv1": {"kernel": conv(f"{blk}.conv1.weight")},
            "conv2": {"kernel": conv(f"{blk}.conv2.weight")},
        }
        s = {}
        p["bn1"], s["bn1"] = bn(f"{blk}.bn1")
        p["bn2"], s["bn2"] = bn(f"{blk}.bn2")
        if f"{blk}.downsample.0.weight" in sd:
            p["downsample_conv"] = {"kernel": conv(f"{blk}.downsample.0.weight")}
            p["downsample_bn"], s["downsample_bn"] = bn(f"{blk}.downsample.1")
        params[name] = p
        stats[name] = s
    return {"params": params, "batch_stats": stats}

"""Audio subsystem tests: spectrogram shapes, ResNet-9 tower, GDT weight
import (against a synthetic torch checkpoint), and the audio-fusion CAM
path."""

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.audio import AudioResNet9, import_gdt_audio_weights
import pytest

from vtc_tpu.audio.spectrogram import (
    FALLBACK,
    N_FRAMES,
    N_FREQ,
    log_spectrogram,
)


def test_spectrogram_shape():
    wav = np.sin(np.linspace(0, 1000, 48000)).astype(np.float32)
    spec = log_spectrogram(wav)
    assert spec.shape == (1, N_FREQ, N_FRAMES) == (1, 257, 199)
    # short audio is padded
    spec2 = log_spectrogram(wav[:10000])
    assert spec2.shape == (1, 257, 199)
    assert FALLBACK.shape == (1, 257, 199)


def test_resnet9_forward():
    model = AudioResNet9()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 1, 257, 199)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 512)
    assert np.isfinite(np.asarray(y)).all()


def test_gdt_weight_import_matches_torch():
    """Build a small torch twin of the resnet9 audio tower, import its
    weights, and check activation parity."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)

    class TorchBasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            identity = self.downsample(x) if self.downsample else x
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + identity)

    class TorchBase(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64, 1))
            self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2))
            self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2))
            self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2))

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return x.mean(dim=(2, 3))

    class TorchAudioResnet9(tnn.Module):
        def __init__(self):
            super().__init__()
            self.base = TorchBase()

        def forward(self, x):
            return self.base(x)

    tmodel = TorchAudioResnet9().eval()
    # perturb BN running stats so import actually carries state
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    sd = {f"audio_network.{k}": v for k, v in tmodel.state_dict().items()}
    variables = import_gdt_audio_weights(sd)

    model = AudioResNet9()
    x = np.random.default_rng(1).normal(size=(2, 1, 257, 199)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_cam_audio_fusion_path():
    """finaltf with init_audio_model: cached audio clips join the comment
    stack through the MLP head (model/model.py:220-230)."""
    from vtc_tpu.data import tokenizer as tk
    from vtc_tpu.models import create_model

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", init_audio_model=True,
    )
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    title = jnp.asarray(tk.tokenize(["a", "b"]))
    comments = jnp.asarray(np.stack([tk.tokenize(["x", "y"])] * 2))
    audio = jnp.asarray(rng.normal(size=(2, 5, 512)).astype(np.float32))

    fv, ft, sim = module.apply(variables, vis, title, comments, audio)
    assert sim.shape == (2, 2)
    # audio influences only the adapted (text) branch; note pure scaling is
    # absorbed: the zero-bias-init MLP is positively homogeneous and CAM
    # L2-normalizes each stack entry, so use *different* audio instead
    audio2 = jnp.asarray(rng.normal(size=(2, 5, 512)).astype(np.float32))
    fv2, ft2, _ = module.apply(variables, vis, title, comments, audio2)
    assert not np.allclose(np.asarray(ft), np.asarray(ft2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(fv2), atol=1e-6)
    # audio presence itself changes the adapted branch
    _, ft_noaudio, _ = module.apply(variables, vis, title, comments)
    assert not np.allclose(np.asarray(ft), np.asarray(ft_noaudio), atol=1e-5)

"""Library-facade tests: the reference's Python class surface (Pix2Pix /
ResUnetGAN / Palette...) — construct, fit, predict, load_from_checkpoint."""

import numpy as np
import pytest

import jax.numpy as jnp

from pai_tpu.utils.images import write_png


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(7)
    entries = []
    for i in range(8):
        x = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        write_png(x, str(tmp_path / f"in_{i}.png"))
        write_png(255 - x, str(tmp_path / f"gt_{i}.png"))
        entries.append(f"- input: in_{i}.png\n  ground_truth: gt_{i}.png\n")
    (tmp_path / "d.yaml").write_text("".join(entries))
    return str(tmp_path / "d.yaml")


@pytest.mark.heavy
def test_pix2pix_fit_predict_reload(tmp_path, dataset):
    from pai_tpu.api import Pix2Pix

    model = Pix2Pix(channel_mults=(1, 2), loss_type="mse", image_size=32)
    summary = model.fit(
        "apirun", dataset, dataset, epochs=1, batch_size=4, val_epochs=1,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ck"))
    assert np.isfinite(summary["val_ssim"])

    x = jnp.zeros((2, 32, 32, 1))
    pred = model.predict(x)
    assert pred.shape == (2, 32, 32, 1)

    reloaded = Pix2Pix.load_from_checkpoint(tmp_path / "ck" / "apirun" / "best")
    pred2 = reloaded.predict(x)
    assert pred2.shape == (2, 32, 32, 1)
    # last checkpoint == best checkpoint here (single validation)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2),
                               rtol=1e-5, atol=1e-6)


def test_res_unet_res_type_selection():
    from pai_tpu.api import ResUnetGAN

    model = ResUnetGAN(res_type="next", channel_mults=(1, 2), loss_type="mse",
                       image_size=32)
    assert model.model_name == "resnext_unet"
    assert model.hparams["model"] == "resnext_unet"


def test_palette_constructor_defaults():
    from pai_tpu.api import Palette

    model = Palette(channel_mults=(1, 2), attention_res=(2,), image_size=32)
    assert model.model_name == "palette"
    assert model.hparams["attention_res"] == "2"


@pytest.mark.heavy
def test_palette_predict_output_process(tmp_path, dataset):
    """Palette.predict(output_process=True) returns the reference's
    reverse-process stack (models/palette.py:79-100): y_T plus every
    (timesteps // 7)-th frame — 9 frames for the 100-step inference
    schedule — with the last frame equal to y_0."""
    from pai_tpu.api import Palette

    model = Palette(channel_mults=(1, 2), attention_res=(2,), image_size=16)
    model.fit("palproc", dataset, epochs=1, batch_size=4, image_size=16,
              log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ck"))

    x = jnp.zeros((1, 16, 16, 1))
    y0, process = model.predict(x, output_process=True)
    assert y0.shape == (1, 16, 16, 1)
    assert process.shape == (1, 9, 16, 16, 1)
    np.testing.assert_array_equal(np.asarray(process[:, -1]), np.asarray(y0))
    # plain predict still returns only y_0, from the same weights
    y0_only = model.predict(x)
    assert y0_only.shape == (1, 16, 16, 1)


def test_output_process_rejected_for_gan_models():
    from pai_tpu.api import Pix2Pix

    model = Pix2Pix(channel_mults=(1, 2), loss_type="mse", image_size=32)
    model._params = {}  # sidestep the no-weights check
    with pytest.raises(ValueError, match="output_process"):
        model.predict(jnp.zeros((1, 32, 32, 1)), output_process=True)


def test_image_datamodule_facade(dataset):
    """ImageDataModule constructor vocabulary + stage/loader semantics match
    the reference (dataset.py:11-107): positional (data_list_file,
    val_list_file, batch_size, normalize); setup("fit") selects train+val,
    setup("predict") points pred_split at the *data* list; train loader
    shuffles, predict loader preserves manifest order with an exact
    n_valid on the padded final batch (drop_last=False semantics)."""
    import inspect

    from pai_tpu import ImageDataModule

    params = list(inspect.signature(ImageDataModule).parameters)
    assert params[:4] == ["data_list_file", "val_list_file", "batch_size",
                          "normalize"]

    dm = ImageDataModule(dataset, dataset, batch_size=3, normalize=True,
                         image_size=32)
    dm.setup("fit")
    assert dm.train_split is not None and dm.val_split is not None
    dm.setup("predict")
    batches = list(dm.predict_dataloader())
    # 8 images, batch 3 -> 3 batches, final padded with n_valid=2
    assert [b.n_valid for b in batches] == [3, 3, 2]
    assert all(b.x.shape == (3, 32, 32, 1) for b in batches)
    # normalized to [-1, 1]
    assert float(batches[0].x.min()) >= -1.0
    assert float(batches[0].x.max()) <= 1.0

    train_batches = list(dm.train_dataloader())
    assert [b.n_valid for b in train_batches] == [3, 3, 2]


def test_image_datamodule_without_val_list(dataset):
    from pai_tpu import ImageDataModule

    dm = ImageDataModule(dataset, batch_size=4)
    dm.setup("fit")
    assert dm.val_split is None
    dm.setup("test")
    assert len(list(dm.test_dataloader())) == 2

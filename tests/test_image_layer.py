"""Image-layer tests: ImagePair geometry (golden numbers from the reference's
integration test), loader, scalers, auditor, queues, toy data."""
import numpy as np
import pytest

from multiplanarunet_tpu.bin.toy_data import create_dataset, create_toy_image
from multiplanarunet_tpu.errors import ReadOnlyAttributeError
from multiplanarunet_tpu.image import ImagePair, ImagePairLoader
from multiplanarunet_tpu.image.auditor import Auditor
from multiplanarunet_tpu.image.queue import (
    EagerQueue,
    LazyQueue,
    LimitationQueue,
    get_data_queues,
)
from multiplanarunet_tpu.io import nifti
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.preprocessing import get_scaler


@pytest.fixture
def anis_pair(tmp_path):
    """12x14x16x3 random image with anisotropic affine diag(1, 0.5, 0.1, 1) —
    the exact fixture of the reference integration test
    (mpunet/tests/integration/test_image_pair_with_valid_image.py:11-38)."""
    rng = np.random.RandomState(0)
    img = rng.rand(12, 14, 16, 3).astype(np.float32)
    lab = rng.randint(0, 3, size=(12, 14, 16)).astype(np.uint8)
    affine = np.diag([1.0, 0.5, 0.1, 1.0])
    ip = tmp_path / "im.nii.gz"
    lp = tmp_path / "lab" / "im.nii.gz"
    lp.parent.mkdir()
    nifti.save(img, ip, affine=affine)
    nifti.save(lab, lp, affine=affine)
    return ImagePair(ip, lp), img, lab


def test_image_pair_golden_geometry(anis_pair):
    pair, img, lab = anis_pair
    # Golden values from the reference integration test:
    # real (scanner-space) center and physical shape of the fixture image
    np.testing.assert_allclose(pair.real_center, [5.5, 3.25, 0.75], atol=1e-5)
    np.testing.assert_allclose(pair.real_shape, [12, 7, 1.6], atol=1e-5)
    np.testing.assert_array_equal(pair.shape, [12, 14, 16, 3])
    assert pair.n_channels == 3


def test_image_pair_lazy_load_fidelity(anis_pair):
    pair, img, lab = anis_pair
    assert not pair.is_loaded
    np.testing.assert_allclose(pair.image, img, rtol=1e-6)
    assert pair.image.dtype == np.float32
    np.testing.assert_array_equal(pair.labels, lab)
    assert pair.is_loaded
    pair.unload()
    assert not pair.is_loaded


def test_image_pair_read_only_attrs(anis_pair):
    pair, *_ = anis_pair
    for attr in ("image", "labels", "affine", "header", "bg_class",
                 "bg_value", "scaler", "interpolator"):
        with pytest.raises(ReadOnlyAttributeError):
            setattr(pair, attr, None)


def test_bg_value_percentile(anis_pair):
    pair, img, _ = anis_pair
    pair.set_bg_value("25pct", compute_now=True)
    want = [float(np.percentile(img[..., c], 25)) for c in range(3)]
    np.testing.assert_allclose(pair.bg_value, want, rtol=1e-6)
    # Default: None -> 1pct, lazily computed per channel
    pair2 = ImagePair(pair.image_path, pair.labels_path)
    pair2.set_bg_value(None, compute_now=False)
    np.testing.assert_allclose(
        pair2.bg_value, [np.percentile(img[..., c], 1) for c in range(3)],
        rtol=1e-5,
    )


def test_scaler_affine_params(anis_pair):
    pair, img, _ = anis_pair
    pair.set_scaler("RobustScaler", compute_now=True)
    scaled = pair.scaler.transform(img)
    center, scale = pair.scaler.affine_params()
    np.testing.assert_allclose(scaled, (img - center) / scale, rtol=1e-5)
    # Channel medians should map to ~0
    med = np.array([np.median(scaled[..., c]) for c in range(3)])
    np.testing.assert_allclose(med, 0.0, atol=1e-5)


def test_volume_sampler_paths(anis_pair):
    pair, img, lab = anis_pair
    pair.set_bg_value(0.0)
    pair.set_scaler("StandardScaler", compute_now=True)
    sampler = pair.interpolator
    # Query at exact voxel centers: centered axes spacing pixdim
    origin, spacing = sampler.origin, sampler.spacing
    np.testing.assert_allclose(spacing, [1.0, 0.5, 0.1], atol=1e-6)
    # Voxel (3, 4, 5) -> real position origin + idx * spacing
    q = (origin + np.array([3, 4, 5]) * spacing).reshape(3, 1)
    got_im = sampler.intrp_image(q.reshape(3, 1, 1))
    np.testing.assert_allclose(np.squeeze(got_im), img[3, 4, 5], rtol=1e-4)
    got_lab = sampler.intrp_labels(q.reshape(3, 1, 1))
    assert int(np.squeeze(got_lab)) == int(lab[3, 4, 5])
    # Scaled device-side volume matches host scaler
    np.testing.assert_allclose(
        sampler.scaled_volume, pair.scaler.transform(img), rtol=1e-5
    )


def test_volume_staging_cache_keyed_on_mode(anis_pair):
    """device_volume_unpacked/packed must not serve a cached volume staged
    under a DIFFERENT quantize/dtype mode (e.g. a u8-staged predictor
    followed by a bf16 one sharing the sampler)."""
    pair, img, lab = anis_pair
    pair.set_bg_value(0.0)
    pair.set_scaler("StandardScaler", compute_now=True)
    sampler = pair.interpolator

    v_bf16 = np.asarray(sampler.device_volume_unpacked(), np.float32)
    v_u8 = np.asarray(
        sampler.device_volume_unpacked(quantize=True), np.float32)
    # Quantized staging is lossy — identical arrays mean the cache ignored
    # the mode switch
    assert np.abs(v_bf16 - v_u8).max() > 0
    # Switching back must restore the exact unquantized staging
    v_back = np.asarray(sampler.device_volume_unpacked(), np.float32)
    np.testing.assert_array_equal(v_bf16, v_back)

    p_bf16 = np.asarray(sampler.device_volume_packed(), np.float32)
    p_u8 = np.asarray(
        sampler.device_volume_packed(quantize=True), np.float32)
    assert np.abs(p_bf16 - p_u8).max() > 0


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    rng = np.random.RandomState(1)
    create_dataset(root / "train", 4, 32, 1, rng, "train")
    create_dataset(root / "val", 2, 32, 1, rng, "val")
    return root


def test_toy_image_has_all_classes():
    rng = np.random.RandomState(3)
    img, lab = create_toy_image(48, 1, rng)
    assert img.shape == (48, 48, 48)
    assert set(np.unique(lab)) == {0, 1, 2, 3}


def test_image_pair_loader(toy_dataset):
    loader = ImagePairLoader(base_dir=toy_dataset / "train", no_log=True)
    assert len(loader) == 4
    assert not loader[0].is_loaded
    ids = sorted(loader.id_to_image)
    assert ids[0].startswith("train_")
    assert loader.get_maximum_real_dim() == 32.0
    sampled = list(loader.get_random(3))
    assert len(sampled) == 3


def test_auditor_on_toy(toy_dataset):
    train = ImagePairLoader(base_dir=toy_dataset / "train", no_log=True)
    paths = [str(p) for p in train.image_paths]
    lab_paths = [str(p) for p in train.label_paths]
    aud = Auditor(paths, lab_paths, logger=ScreenLogger(False),
                  min_dim_2d=16, max_dim_2d=128)
    assert aud.n_classes == 4
    assert aud.n_channels == 1
    assert aud.sample_dim_2D % 16 == 0
    assert aud.real_space_span_2D > 0
    info = aud.info
    assert all(tuple(s) == (32, 32, 32) for s in info["shapes"])


def test_auditor_fill_writes_hparams(toy_dataset, tmp_path):
    import shutil
    from pathlib import Path
    from multiplanarunet_tpu.hyperparameters import YAMLHParams

    preset = (Path(__file__).parent.parent /
              "multiplanarunet_tpu/bin/defaults/MultiPlanar/train_hparams.yaml")
    dst = tmp_path / "train_hparams.yaml"
    shutil.copy(preset, dst)
    hp = YAMLHParams(dst, no_log=True, no_version_control=True)

    train = ImagePairLoader(base_dir=toy_dataset / "train", no_log=True)
    aud = Auditor([str(p) for p in train.image_paths],
                  [str(p) for p in train.label_paths],
                  logger=ScreenLogger(False), min_dim_2d=16, max_dim_2d=64,
                  hparams=hp)
    aud.fill(hp, "2d")
    assert hp["build"]["n_classes"] == 4
    assert hp["build"]["dim"] == aud.sample_dim_2D
    assert hp["fit"]["real_space_span"] == aud.real_space_span_2D
    # Persisted to the YAML file too
    import yaml as _yaml
    on_disk = _yaml.safe_load(dst.read_text())
    assert on_disk["build"]["n_classes"] == 4


def test_eager_and_lazy_queues(toy_dataset):
    loader = ImagePairLoader(base_dir=toy_dataset / "val", no_log=True)
    q = EagerQueue(loader, logger=ScreenLogger(False))
    assert loader.n_loaded == len(loader)
    with q.get_random_image() as img:
        assert img.is_loaded
    loader.unload()

    lq = LazyQueue(loader, logger=ScreenLogger(False))
    assert loader.n_loaded == 0
    with lq.get_image_by_idx(0) as img:
        assert img.is_loaded
    assert loader.n_loaded == 0  # unloaded on exit


def test_limitation_queue_cycles(toy_dataset):
    loader = ImagePairLoader(base_dir=toy_dataset / "train", no_log=True)
    q = LimitationQueue(loader, max_loaded=2, num_access_before_reload=3,
                        preload_now=True, await_preload=True,
                        n_load_jobs=2, logger=ScreenLogger(False))
    assert loader.n_loaded == 2
    seen = set()
    for _ in range(30):
        with q.get_random_image() as img:
            assert img.is_loaded
            seen.add(img.identifier)
    q.loading_pool.join()
    assert len(seen) >= 3  # rotation happened
    assert loader.n_loaded <= 3  # bounded (2 resident + 1 in flight)


def test_get_data_queues_fallback(toy_dataset):
    train = ImagePairLoader(base_dir=toy_dataset / "train", no_log=True)
    val = ImagePairLoader(base_dir=toy_dataset / "val", no_log=True)
    tq, vq = get_data_queues(
        train, val, "limitation", "eager", max_loaded=None,
        num_access_before_reload=50, logger=ScreenLogger(False),
    )
    # max_loaded=None -> limitation falls back to eager
    assert isinstance(tq, EagerQueue)
    assert isinstance(vq, EagerQueue)


def test_loading_pool_recovers_from_corrupt_file(toy_dataset, tmp_path):
    """A corrupt nii in a LimitationQueue triggers the error callback and a
    replacement load (the reference's failure-recovery behavior)."""
    import shutil

    root = tmp_path / "corrupt_ds"
    shutil.copytree(toy_dataset / "train", root)
    # Corrupt one image file (truncate)
    victim = sorted((root / "images").glob("*.nii.gz"))[0]
    victim.write_bytes(b"not a nifti")

    # Loader construction must fail on the corrupt header...
    with pytest.raises(Exception):
        ImagePairLoader(base_dir=root, no_log=True)

    # ...so corrupt DATA (valid header, truncated payload) is the real case:
    shutil.copytree(toy_dataset / "train", root, dirs_exist_ok=True)
    good = victim.read_bytes if False else None
    orig = sorted((toy_dataset / "train" / "images").glob("*.nii.gz"))[0]
    raw = orig.read_bytes()
    import gzip as _gz

    payload = _gz.decompress(raw)
    victim.write_bytes(_gz.compress(payload[:400]))  # header ok, data cut

    loader = ImagePairLoader(base_dir=root, no_log=True)
    loader.set_scaler_and_bg_values(bg_value=1.0, scaler="StandardScaler",
                                    compute_now=False)
    q = LimitationQueue(loader, max_loaded=2, num_access_before_reload=3,
                        preload_now=True, await_preload=True,
                        n_load_jobs=2, logger=ScreenLogger(False))
    # Despite one corrupt image, accesses keep being served
    served = 0
    for _ in range(10):
        with q.get_random_image() as img:
            assert img.is_loaded
            served += 1
    assert served == 10


def test_trainer_rejects_non_sparse_loss():
    import jax

    from multiplanarunet_tpu.errors import NotSparseError
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.parallel import get_mesh
    from multiplanarunet_tpu.train import Trainer

    model = UNet(n_classes=2, dim=16, depth=1, init_filters=4)
    variables = init_model_variables(model)
    trainer = Trainer(model, variables, logger=ScreenLogger(False),
                      mesh=get_mesh(jax.devices()[:1]))
    with pytest.raises(NotSparseError):
        trainer.compile_model(optimizer="Adam", loss="DiceLoss", metrics=[])

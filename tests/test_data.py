"""Data layer tests: VoxCeleb2 tree loading, cropping, augmentation."""

import os

import numpy as np
import pytest

from latentpose_tpu.data.common import crop as crop_lib


@pytest.fixture(scope="module")
def fake_voxceleb_tree(tmp_path_factory):
    """Fabricate a preprocessed VoxCeleb2 tree with 3 identities x 1 video
    x 12 frames + segmentations + a bboxes dict."""
    import cv2
    root = tmp_path_factory.mktemp("voxdata")
    bboxes = {}
    for ident in ("id00001", "id00002", "id00003"):
        bboxes[ident] = {}
        for video in ("videoA",):
            img_dir = root / "images-cropped" / ident / video
            segm_dir = root / "segmentation-cropped" / ident / video
            img_dir.mkdir(parents=True)
            segm_dir.mkdir(parents=True)
            boxes = []
            for f in range(12):
                rng = np.random.RandomState(hash((ident, f)) % 2**31)
                img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
                cv2.imwrite(str(img_dir / f"{f:05d}.jpg"), img)
                segm = np.zeros((64, 64, 3), np.uint8)
                segm[16:48, 16:48] = 255
                cv2.imwrite(str(segm_dir / f"{f:05d}.png"), segm)
                boxes.append([40, 40, 216, 216])  # l, t, r, b in 256-space
            bboxes[ident][video] = np.array(boxes, np.float32)
    np.save(root / "bboxes.npy", bboxes, allow_pickle=True)
    return root


def make_args(root, finetune=False, **over):
    import types
    args = types.SimpleNamespace(
        data_root=str(root), img_dir="images-cropped",
        kp_dir="keypoints-cropped", segm_dir="segmentation-cropped",
        bboxes_dir=str(root / "bboxes.npy"),
        train_split_path="nonexistent.csv", val_split_path="nonexistent.csv",
        finetune=finetune, checkpoint_path="", num_labels=0, inference=False,
        image_size=32, batch_size=2, num_workers=2, prefetch_size=4,
        random_seed=0, draw_oval=True, n_frames_for_encoder=3,
        use_pixelwise_augs=False, use_affine_scale=False,
        use_affine_shift=False)
    for k, v in over.items():
        setattr(args, k, v)
    return args


def test_meta_loader_contract(fake_voxceleb_tree):
    from latentpose_tpu.data import voxceleb2_segmentation_nolandmarks as ds
    args = make_args(fake_voxceleb_tree)
    loader = ds.Wrapper.get_dataloader(args, "train")
    assert loader.num_labels == 3
    assert args.num_labels == 3
    data, target = next(iter(loader))
    assert data["enc_rgbs"].shape == (2, 3, 32, 32, 3)
    assert data["pose_input_rgbs"].shape == (2, 1, 32, 32, 3)
    assert data["target_rgbs"].shape == (2, 1, 32, 32, 3)
    assert target["real_segm"].shape == (2, 1, 32, 32, 1)
    assert target["label"].dtype == np.int32
    # target is masked by segmentation: corners (outside head box) ~ 0
    assert float(np.abs(data["target_rgbs"][:, :, :4, :4]).max()) < 0.25
    assert data["enc_rgbs"].min() >= 0.0 and data["enc_rgbs"].max() <= 1.0


def test_finetune_loader_lists_images(fake_voxceleb_tree):
    from latentpose_tpu.data import voxceleb2_segmentation_nolandmarks as ds
    args = make_args(fake_voxceleb_tree, finetune=True,
                     train_split_path="id00001/videoA")
    loader = ds.Wrapper.get_dataloader(args, "train")
    assert args.num_labels == 1
    assert len(loader.dataset) == 12  # every image of the single identity
    data, target = next(iter(loader))
    # identity == driver == target source (single image)
    np.testing.assert_allclose(data["enc_rgbs"][:, 0],
                               data["pose_input_rgbs"][:, 0])
    assert (target["label"] == 0).all()


def test_bbox_integer_coords_square():
    t, l, b, r = crop_lib.bbox_to_integer_coords(0.1, 0.2, 0.5, 0.6, 64, 64)
    assert (b - t) == (r - l)


def test_crop_with_padding_out_of_bounds():
    img = (np.random.rand(32, 32, 3) * 255).astype(np.uint8)
    out = crop_lib.crop_with_padding(img, -8, -8, 40, 40)
    assert out.shape == (48, 48, 3)
    # deep interior preserved exactly (the algorithm deliberately blurs a
    # band just inside the original border: mask*3+1 > 0 there)
    np.testing.assert_array_equal(out[16:36, 16:36], img[8:28, 8:28])
    # padded corner is not raw reflection: blur+fade changed it
    reflected = np.pad(img, ((8, 8), (8, 8), (0, 0)), mode="reflect")
    assert np.abs(out[:8, :8].astype(int)
                  - reflected[:8, :8].astype(int)).mean() > 2


def test_crop_with_padding_segmentation_zero_top():
    segm = np.full((32, 32), 255, np.uint8)
    out = crop_lib.crop_with_padding(segm, -8, 0, 32, 32, segmentation=True)
    assert out.shape == (40, 32)
    assert out[0].max() == 0  # top pad fades from zero


def test_augment_triplet_shift_consistency():
    import jax
    from latentpose_tpu.data.augmentation import augment_triplet
    key = jax.random.PRNGKey(3)
    # target encodes coordinates; segm = mask; both must shift identically
    b, h = 4, 16
    target = np.tile(np.linspace(0, 1, h)[None, :, None, None],
                     (b, 1, h, 3)).astype(np.float32)
    segm = np.array(target[..., :1] > 0.5, np.float32)
    driver = np.asarray(
        jax.random.uniform(key, (b, h, h, 3)), np.float32)
    d2, t2, s2 = augment_triplet(key, driver, target, segm,
                                 use_shift=True)
    # where segm says "on", target must still be > ~0.5 (same warp applied)
    on = np.asarray(s2[..., 0]) > 0.95
    assert np.asarray(t2)[..., 0][on].min() > 0.4


def test_pixelwise_augment_stays_in_range():
    import jax
    from latentpose_tpu.data.augmentation import pixelwise_augment
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (8, 16, 16, 3))
    out = pixelwise_augment(key, imgs)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # with 10 ops at p=0.25 each, some sample must have changed
    assert float(np.abs(np.asarray(out) - np.asarray(imgs)).max()) > 1e-4


def test_emboss_shapes_range_and_determinism():
    import jax
    from latentpose_tpu.data.augmentation import emboss
    key = jax.random.PRNGKey(7)
    imgs = jax.random.uniform(key, (16, 16, 16, 3))
    out1 = np.asarray(emboss(key, imgs))
    out2 = np.asarray(emboss(key, imgs))
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == imgs.shape
    assert out1.min() >= 0.0 and out1.max() <= 1.0
    # per-sample coin: some samples changed, the others bit-exact original
    changed = np.abs(out1 - np.asarray(imgs)).reshape(16, -1).max(1) > 1e-6
    assert changed.any() and (~changed).any()
    np.testing.assert_array_equal(out1[~changed],
                                  np.asarray(imgs)[~changed])


def test_jpeg_roundtrip_matches_pil_quality_trend():
    """Our DCT-quantization JPEG sim vs PIL's real encoder: reconstruction
    error within the same ballpark at matched quality, and monotonically
    worse at lower quality."""
    import io

    from PIL import Image

    from latentpose_tpu.data.augmentation import jpeg_roundtrip

    rng = np.random.RandomState(0)
    # smooth-ish natural-like image (random noise is jpeg's worst case)
    base = rng.rand(8, 8, 3)
    img = np.kron(base, np.ones((4, 4, 1)))  # 32x32, blocky-smooth
    from scipy.ndimage import uniform_filter
    img = uniform_filter(img, size=(3, 3, 1)).astype(np.float32)

    def pil_rt(arr, q):
        buf = io.BytesIO()
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            buf, "JPEG", quality=int(q))
        return np.asarray(Image.open(buf)).astype(np.float32) / 255.0

    errors = {}
    for q in (70, 95):
        ours = np.asarray(jpeg_roundtrip(img[None], np.array([q])))[0]
        pil = pil_rt(img, q)
        e_ours = np.abs(ours - img).mean()
        e_pil = np.abs(pil - img).mean()
        errors[q] = (e_ours, e_pil)
        # same ballpark: within 3x of the real encoder's error
        assert e_ours < 3 * e_pil + 2e-3, (q, e_ours, e_pil)
        assert e_ours > e_pil / 5, (q, e_ours, e_pil)
    assert errors[70][0] > errors[95][0]  # lower quality -> more artifacts


def test_elastic_local_displacement():
    import jax
    from latentpose_tpu.data.augmentation import elastic
    key = jax.random.PRNGKey(11)
    # gradient image: local displacement changes values by <= alpha * slope
    h = 32
    ramp = np.tile(np.linspace(0, 1, h)[None, :, None, None],
                   (32, 1, h, 3)).astype(np.float32)
    out = np.asarray(elastic(key, jax.numpy.asarray(ramp)))
    assert out.shape == ramp.shape
    delta = np.abs(out - ramp)
    # max displacement 3.5 px on a 1/h-per-px ramp
    assert delta.max() <= 4.5 / h + 1e-3
    changed = delta.reshape(32, -1).max(1) > 1e-6
    assert changed.any() and (~changed).any()  # p=0.125 coin


def test_displace_axis_matches_gather_bilinear():
    """The gather-free shifted-sum warp (displace_axis_bilinear) must equal
    the gather-based grid_sample_bilinear for a single-axis displacement
    field, away from the border (edge-clamp vs reflection differ only
    within max_disp of the edge)."""
    import jax
    import jax.numpy as jnp
    from latentpose_tpu.data.augmentation import displace_axis_bilinear
    from latentpose_tpu.ops.image import grid_sample_bilinear

    key = jax.random.PRNGKey(3)
    b, h, w = 2, 24, 24
    imgs = jax.random.uniform(key, (b, h, w, 3))
    disp = (jax.random.uniform(jax.random.PRNGKey(4), (b, h, w)) * 2.0
            - 1.0) * 3.5  # pixels, |d| <= 3.5

    got = displace_axis_bilinear(imgs, disp, axis=2, max_disp=4)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ref = grid_sample_bilinear(imgs, gx[None] + disp * 2.0 / w,
                               jnp.broadcast_to(gy[None], disp.shape))

    m = 4  # interior only
    np.testing.assert_allclose(np.asarray(got)[:, m:-m, m:-m],
                               np.asarray(ref)[:, m:-m, m:-m],
                               rtol=1e-5, atol=1e-5)

    # weights partition unity: zero displacement is the identity
    ident = displace_axis_bilinear(imgs, jnp.zeros((b, h, w)), axis=1,
                                   max_disp=4)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(imgs),
                               rtol=1e-6, atol=1e-6)


def test_pixelwise_pool_is_complete():
    """Reference SomeOf pool families (augmentation.py:44-81), all 11: blur,
    sharpen, emboss, edge-detect-in-blobs, noise, add, saturation, jpeg,
    multiply, contrast, elastic."""
    from latentpose_tpu.data import augmentation as aug
    names = {f.__name__ for f in aug.PIXELWISE_OPS}
    assert names == {"gaussian_blur", "sharpen", "emboss",
                     "edge_detect_blobby", "additive_noise", "brightness",
                     "multiply", "contrast", "saturation", "jpeg_artifacts",
                     "elastic"}


def test_flagship_uint8_wire_matches_quantized_f32(fake_voxceleb_tree):
    """--transfer_dtype uint8 on the flagship dataset: images/segm/stickman
    come out uint8 straight from the decode path (native loader quantizes
    on its threads; cv2's u8->u8 resize path is the same bytes), equal to
    quantize_batch_u8 of the f32 batch — the masked target within 1 LSB
    where the native f32 resize carries sub-quantum values."""
    from latentpose_tpu.data import voxceleb2_segmentation_nolandmarks as ds
    from latentpose_tpu.runners.loop import quantize_batch_u8

    args_f = make_args(fake_voxceleb_tree, num_workers=1)
    args_u = make_args(fake_voxceleb_tree, num_workers=1,
                       transfer_dtype="uint8")

    def batch(args):
        # part='val': deterministic frame sampling, so both loaders pick
        # the same frames; phase='val': no shuffle
        loader = ds.Wrapper.get_dataloader(args, "val", phase="val")
        data, target = next(iter(loader))
        return {**data, **target}

    want = quantize_batch_u8(batch(args_f))
    got = batch(args_u)
    for key in ("enc_rgbs", "pose_input_rgbs", "real_segm"):
        assert got[key].dtype == np.uint8, key
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
    assert got["target_rgbs"].dtype == np.uint8
    diff = np.abs(got["target_rgbs"].astype(np.int16)
                  - want["target_rgbs"].astype(np.int16))
    assert diff.max() <= 1, diff.max()  # double-rounding headroom
    np.testing.assert_array_equal(got["label"], want["label"])


def test_finetune_uint8_wire(fake_voxceleb_tree):
    from latentpose_tpu.data import voxceleb2_segmentation_nolandmarks as ds
    args = make_args(fake_voxceleb_tree, finetune=True,
                     transfer_dtype="uint8")
    args.train_split_path = "id00001/videoA"
    loader = ds.Wrapper.get_dataloader(args, "train")
    data, target = next(iter(loader))
    assert data["enc_rgbs"].dtype == np.uint8
    assert data["target_rgbs"].dtype == np.uint8
    assert target["real_segm"].dtype == np.uint8
    # corners outside the head box are masked to ~0 in wire units
    assert int(data["target_rgbs"][:, :, :4, :4].max()) < 64

"""Input-pipeline tests: multi-host sharding (SURVEY §2.6 row 4), per-epoch
reshuffle (reference DataLoader(shuffle=True), s3_appearance.py:99), the
llffhold eval split, and the quality-metric helpers."""
from argparse import Namespace

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    from gaussian_garments_tpu.config import DEFAULTS
    from gaussian_garments_tpu.data.synthetic import write_reference_layout

    root = tmp_path_factory.mktemp("ggdata")
    data_root, output_root = root / "data", root / "out"
    write_reference_layout(data_root, output_root, "subj", "seq1",
                           n_cams=4, n_frames=3, nx=6, ny=6, res=32)
    DEFAULTS.data_root = str(data_root)
    DEFAULTS.output_root = str(output_root)
    DEFAULTS.aux_root = str(root / "aux")
    # registered meshes (normally stage-2 output) so AvatarDataset items load
    from gaussian_garments_tpu.utils.io import read_obj, write_obj

    tmpl = read_obj(output_root / "subj" / "stage1" / "template_uv.obj")
    mesh_dir = output_root / "subj" / "stage2" / "seq1" / "meshes"
    mesh_dir.mkdir(parents=True, exist_ok=True)
    for t in range(3):
        write_obj(tmpl, mesh_dir / f"frame_{t:05d}.obj")
    return root


def _s2_args(root):
    return Namespace(subject="subj", sequence="seq1",
                     subject_out=str(root / "out" / "subj"),
                     white_background=False)


def _s3_args(root, shuffle=True, eval=True):
    return Namespace(subject="subj", subject_out=str(root / "out" / "subj"),
                     white_background=False, random_bg=False, blur_mask=False,
                     texture_size=32, shuffle=shuffle, eval=eval, llffhold=2)


class TestMultiHostSharding:
    def test_frame_dataloader_disjoint_union(self, dataset_root):
        from gaussian_garments_tpu.data.readers import FrameDataloader

        args = _s2_args(dataset_root)
        full = FrameDataloader(args)
        shards = [FrameDataloader(args, process_index=i, process_count=2)
                  for i in range(2)]
        names = [set(p.name for p in s.cam_paths) for s in shards]
        assert names[0].isdisjoint(names[1])
        assert names[0] | names[1] == set(p.name for p in full.cam_paths)
        # single-host default unchanged
        assert full.process_count == 1 and len(full.cam_paths) == 4

    def test_avatar_dataset_disjoint_union(self, dataset_root):
        from gaussian_garments_tpu.data.readers import AvatarDataset

        args = _s3_args(dataset_root)
        full = AvatarDataset(args)
        shards = [AvatarDataset(args, process_index=i, process_count=2)
                  for i in range(2)]
        items = [set(s.frame_collection) for s in shards]
        assert items[0].isdisjoint(items[1])
        assert items[0] | items[1] == set(full.frame_collection)
        # the shared shuffle seed keeps slices disjoint after reshuffle too
        for s in shards:
            s.reshuffle(epoch=3)
        items = [set(s.frame_collection) for s in shards]
        assert items[0].isdisjoint(items[1])
        assert items[0] | items[1] == set(full.frame_collection)


class TestReshuffleAndEvalSplit:
    def test_reshuffle_changes_order_not_content(self, dataset_root):
        from gaussian_garments_tpu.data.readers import AvatarDataset

        ds = AvatarDataset(_s3_args(dataset_root))
        first = list(ds.frame_collection)
        ds.reshuffle(epoch=1)
        second = list(ds.frame_collection)
        assert set(first) == set(second)
        assert first != second  # 18 items: collision chance ~1/18!
        ds.reshuffle(epoch=1)
        assert list(ds.frame_collection) == second  # deterministic per epoch

    def test_no_shuffle_keeps_order(self, dataset_root):
        from gaussian_garments_tpu.data.readers import AvatarDataset

        ds = AvatarDataset(_s3_args(dataset_root, shuffle=False))
        first = list(ds.frame_collection)
        ds.reshuffle(epoch=2)
        assert list(ds.frame_collection) == first

    def test_eval_split_held_out(self, dataset_root):
        from gaussian_garments_tpu.data.readers import AvatarDataset
        from gaussian_garments_tpu.models import avatar_gaussian as AG
        from gaussian_garments_tpu.utils.io import read_obj

        tmpl = read_obj(dataset_root / "out" / "subj" / "stage1" / "template_uv.obj")
        bind, _ = AG.build_binding(tmpl["uvs"], tmpl["texture_faces"], 32)
        ds = AvatarDataset(_s3_args(dataset_root), bind=bind)
        train_cams = {c for _, _, c in ds.frame_collection}
        eval_cams = {c for _, _, c in ds.eval_collection}
        assert eval_cams and train_cams
        assert eval_cams.isdisjoint(train_cams)
        assert len(ds.eval_collection) == 3 * 2  # 3 frames × 2 held-out cams
        item = ds.eval_item(0)
        assert item["camera"].original_image.shape[0] == 3

    def test_no_eval_means_empty_split(self, dataset_root):
        from gaussian_garments_tpu.data.readers import AvatarDataset

        ds = AvatarDataset(_s3_args(dataset_root, eval=False))
        assert ds.eval_collection == []


class TestQualityMetrics:
    def test_identical_images_saturate(self):
        import jax.numpy as jnp

        from gaussian_garments_tpu.utils.quality import image_metrics

        img = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32).astype(np.float32))
        m = image_metrics(img, img, jnp.ones((1, 32, 32)))
        assert m["psnr"] >= 100.0 and m["psnr_masked"] >= 100.0
        assert m["ssim"] > 0.99

    def test_noise_reduces_psnr(self):
        import jax.numpy as jnp

        from gaussian_garments_tpu.utils.quality import image_metrics

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        noisy = img + 0.1 * jnp.asarray(rng.randn(3, 32, 32).astype(np.float32))
        m = image_metrics(noisy, img)
        assert 15.0 < m["psnr"] < 30.0

    def test_evaluate_cameras(self, dataset_root):
        import jax.numpy as jnp

        from gaussian_garments_tpu.data.readers import FrameDataloader
        from gaussian_garments_tpu.utils.quality import evaluate_cameras

        cams = FrameDataloader(_s2_args(dataset_root)).load_frame(0)
        out = evaluate_cameras(cams, lambda c: c.original_image, max_cams=2)
        assert out["psnr"] >= 100.0
        assert evaluate_cameras([], lambda c: None) == {}

"""Pipeline engine behavior: immutability, equality, dtype preservation,
vmap-parallel equivalence to sequential results (the reference asserts thread
vs sequential equivalence, test_pipeline.py:196-261; here vmap replaces
threads)."""

import numpy as np
import pytest

from arcadia_microscopy_tools_tpu import ImageOperation, Pipeline
from arcadia_microscopy_tools_tpu.operations import (
    apply_threshold,
    crop_to_center,
    rescale_by_percentile,
    subtract_background_dog,
)


@pytest.fixture
def image(rng):
    return (rng.random((64, 64)) * 4000).astype(np.uint16)


@pytest.fixture
def stack(rng):
    return (rng.random((4, 64, 64)) * 4000).astype(np.uint16)


class TestImageOperation:
    def test_callable(self, image):
        op = ImageOperation(rescale_by_percentile, (0, 100))
        out = op(image)
        assert np.asarray(out).max() == pytest.approx(1.0)

    def test_immutable(self):
        op = ImageOperation(rescale_by_percentile)
        with pytest.raises(AttributeError, match="immutable"):
            op.func = None
        with pytest.raises(AttributeError, match="immutable"):
            del op.args

    def test_equality_and_hash(self):
        a = ImageOperation(rescale_by_percentile, (1, 99), out_range=(0, 1))
        b = ImageOperation(rescale_by_percentile, (1, 99), out_range=(0, 1))
        c = ImageOperation(rescale_by_percentile, (2, 98))
        assert a == b
        assert hash(a) == hash(b)
        assert a != c
        assert a != "not an op"

    def test_repr(self):
        op = ImageOperation(crop_to_center, (10, 10))
        assert "crop_to_center" in repr(op)
        assert "(10, 10)" in repr(op)


class TestPipelineValidation:
    def test_empty_operations_raises(self):
        with pytest.raises(ValueError, match="at least one operation"):
            Pipeline([])

    def test_non_callable_raises(self):
        with pytest.raises(TypeError, match="callable"):
            Pipeline([42])

    def test_bad_max_workers(self):
        with pytest.raises(ValueError, match="max_workers"):
            Pipeline([ImageOperation(rescale_by_percentile)], max_workers=0)

    def test_parallel_copy_warns(self):
        with pytest.warns(UserWarning, match="copy=True has no effect"):
            Pipeline([ImageOperation(rescale_by_percentile)], parallel=True, copy=True)

    def test_tuple_operations_accepted(self, image):
        pipe = Pipeline((ImageOperation(rescale_by_percentile),))
        assert len(pipe) == 1
        pipe(image)

    def test_repr(self):
        pipe = Pipeline(
            [ImageOperation(rescale_by_percentile)], preserve_dtype=True, parallel=True
        )
        r = repr(pipe)
        assert "rescale_by_percentile" in r
        assert "preserve_dtype=True" in r
        assert "parallel=True" in r


class TestPipelineExecution:
    def test_single_op(self, image):
        pipe = Pipeline([ImageOperation(rescale_by_percentile)])
        out = pipe(image)
        assert out.dtype == np.float64
        assert out.max() == pytest.approx(1.0)

    def test_multi_op_composition(self, image):
        pipe = Pipeline(
            [
                ImageOperation(subtract_background_dog, 1.0, 8.0),
                ImageOperation(rescale_by_percentile, (0, 100)),
                ImageOperation(apply_threshold, "otsu"),
            ]
        )
        out = pipe(image)
        assert out.dtype == bool
        # composition equals manual sequential application
        manual = apply_threshold(
            rescale_by_percentile(subtract_background_dog(image, 1.0, 8.0), (0, 100)),
            "otsu",
        )
        np.testing.assert_array_equal(out, np.asarray(manual))

    def test_preserve_dtype(self, image):
        pipe = Pipeline([ImageOperation(rescale_by_percentile)], preserve_dtype=True)
        out = pipe(image)
        assert out.dtype == np.uint16

    def test_parallel_requires_3d(self, image):
        pipe = Pipeline([ImageOperation(rescale_by_percentile)], parallel=True)
        with pytest.raises(ValueError, match="at least 3D"):
            pipe(image)

    def test_parallel_equals_per_slice_sequential(self, stack):
        ops = [
            ImageOperation(rescale_by_percentile, (1, 99)),
            ImageOperation(subtract_background_dog, 0.6, 4.0),
        ]
        parallel = Pipeline(ops, parallel=True)(stack)
        sequential = np.stack([Pipeline(ops)(frame) for frame in stack])
        np.testing.assert_allclose(parallel, sequential, atol=1e-6)

    def test_parallel_preserve_dtype(self, stack):
        pipe = Pipeline(
            [ImageOperation(rescale_by_percentile)], parallel=True, preserve_dtype=True
        )
        out = pipe(stack)
        assert out.dtype == stack.dtype
        assert out.shape == stack.shape

    def test_jax_input_returns_device_array(self, image):
        import jax
        import jax.numpy as jnp

        pipe = Pipeline([ImageOperation(rescale_by_percentile)])
        out = pipe(jnp.asarray(image))
        assert isinstance(out, jax.Array)
        assert out.dtype == jnp.float32

    def test_unhashable_operation_args(self, image):
        """ndarray op arguments (unhashable) bypass the fold cache instead of
        raising TypeError (round-1 advisory)."""
        import jax.numpy as jnp

        def scale_by(x, factors):
            return x * jnp.asarray(factors, dtype=jnp.float32).mean()

        pipe = Pipeline([ImageOperation(scale_by, np.array([2.0, 4.0]))])
        out = pipe(image.astype(np.float32))
        np.testing.assert_allclose(out, image * 3.0, rtol=1e-6)

    def test_eager_fallback_on_data_dependent_python(self, image):
        """Reference-style numpy ops with Python control flow on array values
        fall back to eager execution instead of crashing (round-1 advisory)."""

        def host_op(x):
            if x.max() > 0:  # data-dependent Python branch
                return np.asarray(x) / float(np.asarray(x).max())
            return np.asarray(x)

        pipe = Pipeline([ImageOperation(host_op)])
        out = pipe(image)
        assert float(np.max(out)) == 1.0

    def test_eager_fallback_parallel_per_frame(self, stack):
        """The eager fallback honors parallel's per-frame semantics."""

        def host_norm(x):
            mx = float(np.asarray(x).max())  # forces concretization
            return np.asarray(x, dtype=np.float64) / (mx if mx else 1.0)

        pipe = Pipeline([ImageOperation(host_norm)], parallel=True)
        out = pipe(stack)
        expected = np.stack([host_norm(f) for f in stack])
        np.testing.assert_allclose(out, expected)

    def test_pipeline_is_jittable_inside_larger_program(self, image):
        """The whole pipeline can be embedded in a user's own jitted function."""
        import jax
        import jax.numpy as jnp

        ops = (
            ImageOperation(rescale_by_percentile, (0, 100)),
            ImageOperation(apply_threshold, "otsu"),
        )

        @jax.jit
        def program(x):
            out = x
            for op in ops:
                out = op(out)
            return jnp.sum(out)

        total = int(program(jnp.asarray(image)))
        expected = int(
            np.asarray(apply_threshold(rescale_by_percentile(image, (0, 100)), "otsu")).sum()
        )
        assert total == expected

    def test_integration_dog_rescale_threshold(self, rng):
        """Realistic mini-pipeline on synthetic cells (reference
        test_pipeline.py:264-328 integration tests)."""
        yy, xx = np.mgrid[0:96, 0:96]
        img = rng.normal(100, 10, (96, 96))
        for cy, cx in [(20, 20), (50, 70), (75, 30)]:
            img += 2000 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
        img = img.clip(0).astype(np.uint16)
        pipe = Pipeline(
            [
                ImageOperation(subtract_background_dog, 1.0, 10.0),
                ImageOperation(rescale_by_percentile, (0.5, 99.5)),
                ImageOperation(apply_threshold, "otsu"),
            ]
        )
        mask = pipe(img)
        from arcadia_microscopy_tools_tpu.ops import label

        n = int(np.asarray(label(mask)).max())
        assert n == 3


class TestParallelSharding:
    def test_parallel_stack_sharded_across_devices(self):
        """parallel=True lays the frame axis over every device (the CPU test
        topology exposes 8): results match the serial fold exactly and the
        compiled output actually spans the mesh."""
        import jax

        from arcadia_microscopy_tools_tpu.operations import rescale_by_percentile

        rng = np.random.default_rng(7)
        stack = (rng.random((8, 64, 64)) * 4000).astype(np.uint16)
        pipe = Pipeline([ImageOperation(rescale_by_percentile, (1, 99))], parallel=True)
        serial = Pipeline([ImageOperation(rescale_by_percentile, (1, 99))])

        out = pipe(stack)
        expected = np.stack([serial(f) for f in stack])
        np.testing.assert_allclose(out, expected, rtol=1e-6)

        sharded_in = Pipeline._shard_frames(jax.numpy.asarray(stack))
        assert len(sharded_in.sharding.device_set) == len(jax.devices())

    def test_parallel_nondivisible_frame_count_still_works(self):
        from arcadia_microscopy_tools_tpu.operations import rescale_by_percentile

        rng = np.random.default_rng(7)
        stack = (rng.random((5, 32, 32)) * 4000).astype(np.uint16)
        pipe = Pipeline([ImageOperation(rescale_by_percentile, (1, 99))], parallel=True)
        out = pipe(stack)
        assert out.shape == stack.shape

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

    def test_parallel_indivisible_frame_count_pads_and_slices(self):
        # 10 frames on the 8-virtual-device mesh: not divisible, so the stack
        # is padded to 16 for an even layout and sliced back - results must
        # still match per-frame sequential exactly, with 10 output frames
        # (regression: this case used to silently fall back to one device).
        rng = np.random.default_rng(7)
        stack = (rng.random((10, 32, 32)) * 4000).astype(np.uint16)
        ops = [ImageOperation(rescale_by_percentile, (1, 99))]
        out = Pipeline(ops, parallel=True)(stack)
        assert out.shape[0] == 10
        sequential = np.stack([Pipeline(ops)(frame) for frame in stack])
        np.testing.assert_allclose(out, sequential, atol=1e-6)

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

        sharded_in, n = Pipeline._shard_frames(jax.numpy.asarray(stack))
        assert n == 8
        assert len(sharded_in.sharding.device_set) == len(jax.devices())

    def test_parallel_nondivisible_frame_count_still_works(self):
        from arcadia_microscopy_tools_tpu.operations import rescale_by_percentile

        rng = np.random.default_rng(7)
        stack = (rng.random((5, 32, 32)) * 4000).astype(np.uint16)
        pipe = Pipeline([ImageOperation(rescale_by_percentile, (1, 99))], parallel=True)
        out = pipe(stack)
        assert out.shape == stack.shape


class TestReferenceSemanticsPort:
    """Verbatim port of the reference's pipeline-semantics tests
    (/root/reference/src/arcadia_microscopy_tools/tests/test_pipeline.py:
    84-328), so drop-in compatibility is proven by the reference's own
    assertions rather than by adjacent coverage. Helper ops mirror the
    reference test module's module-level functions."""

    @staticmethod
    def _double(intensities):
        return intensities * 2

    @staticmethod
    def _add_ten(intensities):
        return intensities + 10

    @staticmethod
    def _to_float_normalized(intensities):
        return intensities.astype(float) / intensities.max()

    def test_create_pipeline_defaults(self):
        ops = [ImageOperation(self._double), ImageOperation(self._add_ten)]
        pipeline = Pipeline(operations=ops)
        assert len(pipeline) == 2
        assert pipeline.copy is False
        assert pipeline.preserve_dtype is False
        assert pipeline.parallel is False

    def test_create_pipeline_with_copy(self):
        pipeline = Pipeline(operations=[ImageOperation(self._double)], copy=True)
        assert pipeline.copy is True

    def test_copy_true_protects_input_from_inplace_ops(self):
        """copy=True semantics (reference pipeline.py:117-121): an operation
        that mutates its argument in place must not clobber the caller's
        array. In-place mutation forces the eager path (np.ndarray methods
        are untraceable), which is exactly where the reference's copy
        matters; the jitted path cannot mutate inputs at all."""

        def inplace_double(intensities):
            # np.asarray on a traced value raises TracerArrayConversionError,
            # forcing the eager fallback - where the array really IS the
            # caller's buffer and in-place mutation is observable
            host = np.asarray(intensities)
            host *= 2
            return host

        image = np.array([[1, 2], [3, 4]], dtype=np.uint16)
        original = image.copy()
        result = Pipeline([ImageOperation(inplace_double)], copy=True)(image)
        np.testing.assert_array_equal(image, original)  # caller's array intact
        np.testing.assert_array_equal(result, original * 2)

        # and without copy=True the eager path mutates the caller's array,
        # exactly as the reference does (amt/pipeline.py:117-121)
        mutable = original.copy()
        Pipeline([ImageOperation(inplace_double)])(mutable)
        np.testing.assert_array_equal(mutable, original * 2)

    def test_no_copy_never_mutates_through_jit(self):
        """Conscious divergence, pinned: the reference without copy=True
        hands the caller's NumPy array straight to the ops, so an in-place
        op clobbers it. Here ops receive traced JAX values on the jitted
        path, where augmented assignment is out-of-place - the caller's
        array survives EVEN without copy=True. Strictly safer; copy=True
        still matters on the eager-fallback path (see the test above)."""

        def inplace_double(intensities):
            intensities *= 2  # out-of-place on traced values
            return intensities

        image = np.array([[1, 2], [3, 4]], dtype=np.uint16)
        result = Pipeline([ImageOperation(inplace_double)])(image)
        np.testing.assert_array_equal(image, [[1, 2], [3, 4]])
        np.testing.assert_array_equal(result, [[2, 4], [6, 8]])

    def test_pipeline_single_operation(self):
        pipeline = Pipeline(operations=[ImageOperation(self._double)])
        image = np.array([1, 2, 3], dtype=np.uint16)
        result = pipeline(image)
        np.testing.assert_array_equal(result, [2, 4, 6])
        assert result.dtype == np.uint16

    def test_pipeline_multiple_operations(self):
        pipeline = Pipeline(
            operations=[ImageOperation(self._double), ImageOperation(self._add_ten)]
        )
        image = np.array([1, 2, 3], dtype=np.uint16)
        result = pipeline(image)
        np.testing.assert_array_equal(result, [12, 14, 16])
        assert result.dtype == np.uint16

    def test_preserve_dtype_default_allows_float(self):
        pipeline = Pipeline(operations=[ImageOperation(self._to_float_normalized)])
        image = np.array([10, 20, 30], dtype=np.uint16)
        result = pipeline(image)
        assert result.dtype in (np.float32, np.float64)
        np.testing.assert_allclose(result, [1 / 3, 2 / 3, 1.0], rtol=1e-6)

    def test_preserve_dtype_true(self):
        pipeline = Pipeline(
            operations=[ImageOperation(self._to_float_normalized)], preserve_dtype=True
        )
        image = np.array([10, 20, 30], dtype=np.uint16)
        assert pipeline(image).dtype == np.uint16

    def test_parallel_pipeline_attrs(self):
        pipeline = Pipeline(operations=[ImageOperation(self._double)], parallel=True)
        assert len(pipeline) == 1
        assert pipeline.parallel is True
        assert pipeline.max_workers is None
        pipeline4 = Pipeline(
            operations=[ImageOperation(self._double)], parallel=True, max_workers=4
        )
        assert pipeline4.max_workers == 4

    def test_parallel_rejects_1d_and_2d_input(self):
        pipeline = Pipeline(operations=[ImageOperation(self._double)], parallel=True)
        with pytest.raises(ValueError, match="at least 3D input"):
            pipeline(np.array([[1, 2], [3, 4]], dtype=np.uint16))
        with pytest.raises(ValueError, match="at least 3D input"):
            pipeline(np.array([1, 2, 3], dtype=np.uint16))

    def test_parallel_3d_array(self):
        pipeline = Pipeline(operations=[ImageOperation(self._double)], parallel=True)
        image = np.array(
            [[[1, 2], [3, 4]], [[5, 6], [7, 8]], [[9, 10], [11, 12]]], dtype=np.uint16
        )
        result = pipeline(image)
        np.testing.assert_array_equal(result, image * 2)
        assert result.dtype == np.uint16

    def test_parallel_preserve_dtype_both_ways(self):
        image = np.array([[[10, 20], [30, 40]]], dtype=np.uint16)
        loose = Pipeline(
            operations=[ImageOperation(self._to_float_normalized)], parallel=True
        )(image)
        assert loose.dtype in (np.float32, np.float64)
        strict = Pipeline(
            operations=[ImageOperation(self._to_float_normalized)],
            preserve_dtype=True,
            parallel=True,
        )(image)
        assert strict.dtype == np.uint16

    def test_parallel_multiple_operations(self):
        pipeline = Pipeline(
            operations=[ImageOperation(self._double), ImageOperation(self._add_ten)],
            parallel=True,
        )
        image = np.array([[[1, 2], [3, 4]], [[5, 6], [7, 8]]], dtype=np.uint16)
        np.testing.assert_array_equal(pipeline(image), image * 2 + 10)

    def test_parallel_single_frame(self):
        pipeline = Pipeline(operations=[ImageOperation(self._double)], parallel=True)
        image = np.array([[[1, 2], [3, 4]]], dtype=np.uint16)
        np.testing.assert_array_equal(pipeline(image), image * 2)

    def test_parallel_many_frames(self, rng):
        pipeline = Pipeline(
            operations=[ImageOperation(self._double)], parallel=True, max_workers=2
        )
        image = rng.integers(0, 100, size=(10, 32, 32)).astype(np.uint16)
        np.testing.assert_array_equal(pipeline(image), image * 2)

    def test_normalization_workflow_dtype_false(self, rng):
        image = rng.integers(0, 65535, size=(3, 128, 128)).astype(np.uint16)
        pipeline = Pipeline(
            operations=[
                ImageOperation(
                    rescale_by_percentile, percentile_range=(2, 98), out_range=(0, 1)
                )
            ],
            preserve_dtype=False,
            parallel=True,
        )
        result = pipeline(image)
        assert result.dtype in (np.float32, np.float64)
        assert result.min() >= 0
        assert result.max() <= 1

    def test_normalization_workflow_dtype_true(self, rng):
        image = rng.integers(0, 65535, size=(3, 128, 128)).astype(np.uint16)
        pipeline = Pipeline(
            operations=[
                ImageOperation(
                    rescale_by_percentile,
                    percentile_range=(2, 98),
                    out_range=(0, 65535),
                )
            ],
            preserve_dtype=True,
            parallel=True,
        )
        assert pipeline(image).dtype == np.uint16

    def test_background_subtraction_and_normalization(self, rng):
        image = rng.integers(100, 200, size=(2, 64, 64)).astype(np.uint16)
        pipeline = Pipeline(
            operations=[
                ImageOperation(subtract_background_dog, low_sigma=1, high_sigma=10),
                ImageOperation(
                    rescale_by_percentile, percentile_range=(1, 99), out_range=(0, 1)
                ),
            ],
            preserve_dtype=False,
            parallel=True,
        )
        result = pipeline(image)
        assert result.dtype in (np.float32, np.float64)
        assert result.shape == image.shape

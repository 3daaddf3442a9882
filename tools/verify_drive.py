import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from arcadia_microscopy_tools_tpu import Pipeline, ImageOperation, overlay_channels
from arcadia_microscopy_tools_tpu.operations import (
    subtract_background_dog, rescale_by_percentile, apply_threshold)
from arcadia_microscopy_tools_tpu.ops.labeling import label
from arcadia_microscopy_tools_tpu.ops.regionprops import measure_labels, measure_intensity
from arcadia_microscopy_tools_tpu.core.channels import CHANNELS

print("devices:", jax.devices())
rng = np.random.default_rng(0)
img = rng.normal(150, 15, (2048, 2048)).clip(0, None)
yy, xx = np.mgrid[0:32, 0:32]
blob = 2500 * np.exp(-((yy-16)**2 + (xx-16)**2) / 24.0)
for _ in range(200):
    cy, cx = rng.integers(16, 2032, 2)
    img[cy-16:cy+16, cx-16:cx+16] += blob
img = img.astype(np.uint16)

pipe = Pipeline([
    ImageOperation(subtract_background_dog, 1.0, 16.0),
    ImageOperation(rescale_by_percentile, (0.5, 99.9)),
    ImageOperation(apply_threshold, "otsu"),
])
mask = pipe(img); mask = np.asarray(mask)
t0=time.time(); mask2 = np.asarray(pipe(img)); t_pipe = time.time()-t0
lbl = label(np.asarray(mask)); _ = np.asarray(lbl)
t0=time.time(); lbl = label(np.asarray(mask)); lbl_h = np.asarray(lbl); t_lbl = time.time()-t0
props = measure_labels(lbl, max_cells=512)
t0=time.time(); props = measure_labels(lbl, max_cells=512); a=np.asarray(props["area"]); t_meas=time.time()-t0
valid = np.asarray(props["valid"])
areas = a[valid.astype(bool)]
print(f"cells={int(valid.sum())} median_area={np.median(areas):.0f}")
inten = measure_intensity(lbl, np.asarray(img, np.float32), max_cells=512)
print("intensity keys:", sorted(inten.keys())[:4])
ov = overlay_channels(np.zeros((256,256)), {CHANNELS["DAPI"]: np.asarray(img[:256,:256]/65535.0)})
print("overlay", ov.shape, float(np.max(ov)))
# probes
try:
    apply_threshold(img, "bogus"); print("FAIL: bogus accepted")
except ValueError: print("probe bogus-threshold: OK")
try:
    Pipeline([ImageOperation(rescale_by_percentile)], parallel=True)(img); print("FAIL: 2D parallel accepted")
except ValueError: print("probe 2D-parallel: OK")
const = np.full((512,512), 7, np.uint16)
cm = np.asarray(apply_threshold(const, "otsu"))
print("probe constant-image all-false:", not cm.any())
print(f"timings pipeline={t_pipe:.2f}s label={t_lbl:.2f}s measure={t_meas:.2f}s")
assert 150 <= int(valid.sum()) <= 220, "cell count out of range"
assert 60 < np.median(areas) < 400, "area implausible"
print("VERIFY OK")

"""Synthesize valid LIF v2 files for tests.

The reference ships no LIF fixture (its 898-line leica.py has zero direct
test coverage - SURVEY.md section 4 flags this as the gap to close). This
builder writes spec-conformant LIF containers exercising every parser path:
channel inference from laser state and detector maps, CRS wavelength math,
z-stacks, timelapses, montages with TileScanInfo, and Lambda scans.
"""

from __future__ import annotations

import struct
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import numpy as np

_FILETIME_EPOCH = datetime(1601, 1, 1, tzinfo=timezone.utc)


def _filetime(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int((dt - _FILETIME_EPOCH).total_seconds() * 1e7)


def default_lasers():
    return [
        {"LightSourceType": "4", "LightSourceName": "SuperContVisible Light",
         "WavelengthDouble": "488", "PowerState": "On", "PowerStateDouble": "1"},
        {"LightSourceType": "1", "LightSourceName": "UV Light",
         "WavelengthDouble": "405", "PowerState": "Off"},
    ]


class LifBuilder:
    """Accumulates images, then writes a LIF v2 container."""

    def __init__(self):
        self.root = ET.Element("LMSDataContainerHeader", {"Version": "2"})
        self.children = ET.SubElement(self.root, "Children")
        self.blocks: dict[str, bytes] = {}
        self._block_counter = 0

    def add_image(
        self,
        name: str,
        data: np.ndarray,  # (C, [Z or T or M or Lambda,] Y, X) uint16; C may be 1
        dims: list[tuple[int, int, float, str]],  # (dim_id, n, length, unit), X/Y required
        channel_properties: list[dict[str, str]] | None = None,
        lasers: list[dict[str, str]] | None = None,
        confocal: dict[str, str] | None = None,
        timestamp: datetime | None = datetime(2025, 6, 1, 12, 0, 0),
        tile_scan: list[dict[str, str]] | None = None,
        laser_values: list[dict[str, str]] | None = None,
        lambda_definition: dict[str, str] | None = None,
    ) -> None:
        n_channels = data.shape[0]
        block_id = f"MemBlock_{self._block_counter}"
        self._block_counter += 1

        elem = ET.SubElement(self.children, "Element", {"Name": name})
        data_el = ET.SubElement(elem, "Data")
        image_el = ET.SubElement(data_el, "Image")
        desc_el = ET.SubElement(image_el, "ImageDescription")

        # channels: interleave channel as the slowest axis (plane-sequential)
        per_channel_bytes = int(np.prod(data.shape[1:])) * 2
        channels_el = ET.SubElement(desc_el, "Channels")
        for c in range(n_channels):
            ch = ET.SubElement(
                channels_el,
                "ChannelDescription",
                {
                    "DataType": "0",
                    "ChannelTag": "0",
                    "Resolution": "16",
                    "NameOfMeasuredQuantity": "",
                    "Min": "0",
                    "Max": "65535",
                    "Unit": "",
                    "LUTName": "Green",
                    "IsLUTInverted": "0",
                    "BytesInc": str(c * per_channel_bytes),
                    "BitInc": "0",
                },
            )
            props = (channel_properties or [{}] * n_channels)[c]
            for key, value in props.items():
                p = ET.SubElement(ch, "ChannelProperty")
                ET.SubElement(p, "Key").text = key
                ET.SubElement(p, "Value").text = value

        # dimensions: data.shape[1:] must match dims with n>1 plus Y, X order
        dims_el = ET.SubElement(desc_el, "Dimensions")
        # compute BytesInc: X fastest, then Y, then others in given order
        sorted_dims = sorted(dims, key=lambda d: {1: 0, 2: 1}.get(d[0], 2))
        stride = 2
        bytes_inc = {}
        for dim_id, n, _length, _unit in sorted_dims:
            bytes_inc[dim_id] = stride
            stride *= n
        for dim_id, n, length, unit in dims:
            ET.SubElement(
                dims_el,
                "DimensionDescription",
                {
                    "DimID": str(dim_id),
                    "NumberOfElements": str(n),
                    "Origin": "0",
                    "Length": str(length),
                    "Unit": unit,
                    "BitInc": "0",
                    "BytesInc": str(bytes_inc[dim_id]),
                },
            )

        ET.SubElement(
            image_el, "Memory", {"Size": str(data.nbytes), "MemoryBlockID": block_id}
        )

        tsl = ET.SubElement(image_el, "TimeStampList")
        if timestamp is not None:
            tsl.set("NumberOfTimeStamps", "1")
            tsl.text = format(_filetime(timestamp), "x")
        else:
            tsl.set("NumberOfTimeStamps", "0")
            tsl.text = ""

        # HardwareSetting attachment with laser array + confocal settings
        hw = ET.SubElement(
            image_el, "Attachment", {"Name": "HardwareSetting", "Application": "LAS X"}
        )
        atl_attrs = {
            "Zoom": "1.0",
            "PixelDwellTime": "1e-06",
            "ScanSpeed": "400",
            "LineAverage": "1",
            "Line_Accumulation": "1",
            "FrameAverage": "1",
            "FrameAccumulation": "1",
            "Magnification": "20",
            "NumericalAperture": "0.75",
            "ObjectiveName": "HC PL APO 20x/0.75 ",
        }
        if confocal:
            atl_attrs.update(confocal)
        atl = ET.SubElement(hw, "ATLConfocalSettingDefinition", atl_attrs)
        laser_array = ET.SubElement(atl, "LaserArray")
        for laser in lasers if lasers is not None else default_lasers():
            ET.SubElement(laser_array, "Laser", laser)
        if lambda_definition:
            ld = ET.SubElement(atl, "LambdaDefinition")
            ET.SubElement(ld, "LambdaExcitation", lambda_definition)

        if tile_scan is not None:
            ts_el = ET.SubElement(image_el, "Attachment", {"Name": "TileScanInfo"})
            for tile in tile_scan:
                ET.SubElement(ts_el, "Tile", tile)

        if laser_values is not None:
            lv_attach = ET.SubElement(image_el, "Attachment", {"Name": "LaserValues"})
            laser_el = ET.SubElement(lv_attach, "Laser")
            sp = ET.SubElement(laser_el, "StagePosition")
            for lv in laser_values:
                ET.SubElement(sp, "LaserValues", lv)

        self.blocks[block_id] = np.ascontiguousarray(data.astype("<u2")).tobytes()

    def write(self, path) -> None:
        xml_text = ET.tostring(self.root, encoding="unicode")
        xml_bytes = xml_text.encode("utf-16-le")
        with open(path, "wb") as fh:
            # header block
            payload_len = 1 + 4 + len(xml_bytes)
            fh.write(struct.pack("<II", 0x70, payload_len))
            fh.write(b"\x2a")
            fh.write(struct.pack("<I", len(xml_text)))
            fh.write(xml_bytes)
            # memory blocks
            for block_id, blob in self.blocks.items():
                bid = block_id.encode("utf-16-le")
                payload_len = 1 + 8 + 1 + 4 + len(bid)
                fh.write(struct.pack("<II", 0x70, payload_len))
                fh.write(b"\x2a")
                fh.write(struct.pack("<Q", len(blob)))
                fh.write(b"\x2a")
                fh.write(struct.pack("<I", len(block_id)))
                fh.write(bid)
                fh.write(blob)


def simple_confocal_lif(path, name="Series001", shape=(256, 256)):
    """Single-channel 2D confocal image, WLL laser on at 488 nm."""
    rng = np.random.default_rng(0)
    data = (rng.random((1,) + shape) * 4000).astype(np.uint16)
    b = LifBuilder()
    h, w = shape
    b.add_image(
        name,
        data,
        dims=[(1, w, w * 0.284e-6, "m"), (2, h, h * 0.284e-6, "m")],
        channel_properties=[{"DetectorName": "HyD S 1", "BeamRoute": "10;0"}],
    )
    b.write(path)
    return data

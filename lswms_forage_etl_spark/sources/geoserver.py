"""S16 — GeoServer image-mosaic publisher (the last §2.1 row).

Reference behavior (tools.py:70-139, import_biomass.py:55-76): per new
raster, zip it together with the mosaic's two `.properties` files; if the
coverage store does not exist POST the zip to create the imagemosaic and
then enable the time dimension on the coverage (ISO8601 LIST presentation,
GEOTIFF format); if it exists POST the zip as a harvested granule.

Engine form: the same injectable-transport pattern as the S14/S15 REST
sinks — `transport(method, url, payload) -> (status, body)` is passed in,
so tests (and air-gapped runs) never open sockets; a production transport
would be a urllib call with basic auth. Publishing is catalog-scale
(one call per new raster file, driven by the S17 manifest), so this is a
driver-side integration shim, not a distributed operator.
"""

from __future__ import annotations

import glob
import io
import os
import zipfile
from typing import Callable, Sequence

Transport = Callable[[str, str, bytes | str | None], tuple[int, str]]

TIME_DIMENSION_XML = (
    "<coverage><enabled>true</enabled>"
    "<metadata><entry key=\"time\"><dimensionInfo>"
    "<enabled>true</enabled><presentation>LIST</presentation>"
    "<units>ISO8601</units>"
    "</dimensionInfo></entry></metadata>"
    "<supportedFormats><string>GEOTIFF</string></supportedFormats>"
    "</coverage>")


def build_mosaic_zip(raster_path: str, properties_dir: str) -> bytes:
    """Zip one raster with the mosaic's two `.properties` files, in memory
    (zip_files, tools.py:70-103 — which also insists on exactly two
    properties files and aborts otherwise)."""
    props = sorted(glob.glob(os.path.join(properties_dir, "*.properties")))
    if len(props) != 2:
        raise ValueError(
            f"expected exactly 2 .properties files in {properties_dir}, "
            f"found {len(props)}")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for p in props:
            zf.write(p, os.path.basename(p))
        zf.write(raster_path, os.path.basename(raster_path))
    return buf.getvalue()


class GeoServerPublisher:
    """Mirrors the reference's geoclient call sequence against any
    transport. URLs follow the GeoServer REST layout the reference's
    catalog client ultimately hits."""

    def __init__(self, base_url: str, workspace: str, transport: Transport):
        self.base = base_url.rstrip("/")
        self.workspace = workspace
        self.transport = transport

    def _store_url(self, store: str) -> str:
        return (f"{self.base}/workspaces/{self.workspace}"
                f"/coveragestores/{store}")

    def store_exists(self, store: str) -> bool:
        status, _ = self.transport("GET", self._store_url(store) + ".xml",
                                   None)
        return 200 <= status < 300

    def create_mosaic(self, store: str, zip_payload: bytes) -> None:
        """create_imagemosaic + enable-time (tools.py:105-131)."""
        status, body = self.transport(
            "POST", self._store_url(store) + "/file.imagemosaic", zip_payload)
        if not 200 <= status < 300:
            raise RuntimeError(f"mosaic create failed ({status}): {body}")
        status, body = self.transport(
            "PUT", self._store_url(store) + f"/coverages/{store}.xml",
            TIME_DIMENSION_XML)
        if not 200 <= status < 300:
            raise RuntimeError(f"enable-time failed ({status}): {body}")

    def update_mosaic(self, store: str, zip_payload: bytes) -> None:
        """harvest_uploadgranule (tools.py:133-136)."""
        status, body = self.transport(
            "POST", self._store_url(store) + "/file.imagemosaic?recalculate=",
            zip_payload)
        if not 200 <= status < 300:
            raise RuntimeError(f"granule harvest failed ({status}): {body}")

    def publish(self, store: str, raster_paths: Sequence[str],
                properties_dir: str) -> dict[str, int]:
        """Publish new rasters (typically the S17 manifest): create the
        store on first contact, harvest granules afterwards
        (import_biomass.py:66-76). Returns action counts."""
        created = updated = 0
        for raster in raster_paths:
            payload = build_mosaic_zip(raster, properties_dir)
            if not self.store_exists(store):
                self.create_mosaic(store, payload)
                created += 1
            else:
                self.update_mosaic(store, payload)
                updated += 1
        return {"created": created, "updated": updated}

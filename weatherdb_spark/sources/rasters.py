"""S12 — multi-annual raster / DEM acquisition and gridded-raster parsing
(reference weatherdb/utils/get_data.py:22-186 ``download_ma_rasters``,
:189-363 DEM selection over the Copernicus PRISM catalog).

Split the same way as :mod:`weatherdb_spark.sources.ftp`: the parsing —
ESRI ASCII grid text into the (col, row, term, value) gridded table that
``Broker.update_ma_raster_from_grid`` samples (operators/raster.py) —
and the catalog selection logic are pure, fixture-testable functions;
the network fetch is a thin, import-gated wrapper that raises with
guidance when offline (this container has no outbound network). The
DWD multi-annual grids are published as ESRI ASCII GRID text (.asc), so
the parser here covers the reference's raster ingest end of S12 without
a GDAL/rasterio dependency.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MA_RASTER_DOI = "10.5281/zenodo.10066045"  # get_data.py:46 (public dataset)
PRISM_URL = (
    "https://prism-dem-open.copernicus.eu/pd-desk-open-access/publicDemURLs"
)  # get_data.py:201
#: connect+read timeout for every catalog/tile HTTP request — a hung
#: mirror must fail loudly, not block the pipeline forever
DOWNLOAD_TIMEOUT_S = 120


def _http_get(url: str, **kw):
    """The one sanctioned HTTP fetch: timeout + raise_for_status, so a
    404/HTML error body never feeds json.loads or lands as a broken
    tile, and a hung mirror cannot block forever. Every new request in
    this module goes through here."""
    import requests

    resp = requests.get(url, timeout=DOWNLOAD_TIMEOUT_S, **kw)
    resp.raise_for_status()
    return resp

_HEADER_KEYS = {
    "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter", "yllcenter",
    "cellsize", "nodata_value",
}


def parse_esri_ascii_grid(text: str) -> tuple[dict, list[list[float]]]:
    """ESRI ASCII GRID text -> (header, rows top-to-bottom). NODATA cells
    become None. Header keys lowercase; ``xllcenter`` variants are
    normalized to corner coordinates (corner = center - cellsize/2)."""
    header: dict = {}
    data: list[list[float]] = []
    nodata = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        first = line.split(None, 1)[0].lower()
        if not data and first in _HEADER_KEYS:
            key, val = line.split(None, 1)
            header[key.lower()] = float(val)
        else:
            if nodata is None:
                nodata = header.get("nodata_value", -9999.0)
            data.append(
                [None if float(v) == nodata else float(v)
                 for v in line.split()]
            )
    for axis in ("x", "y"):
        if f"{axis}llcenter" in header:
            header[f"{axis}llcorner"] = (
                header.pop(f"{axis}llcenter") - header["cellsize"] / 2
            )
    if len(data) != int(header.get("nrows", len(data))):
        raise ValueError(
            f"grid has {len(data)} rows, header says {header.get('nrows')}"
        )
    return header, data


def read_ascii_grid(path: str | Path) -> tuple[dict, list[list[float]]]:
    """File variant; transparently decompresses ``.gz`` (the CDC grids
    ship gzipped)."""
    p = Path(path)
    raw = p.read_bytes()
    if p.suffix == ".gz" or raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return parse_esri_ascii_grid(io.TextIOWrapper(io.BytesIO(raw)).read())


def ascii_grid_df(
    spark: SparkSession,
    header: dict,
    rows: Sequence[Sequence[float | None]],
    term: str,
) -> tuple[DataFrame, float, float, float]:
    """Gridded raster table for ``Broker.update_ma_raster_from_grid``:
    (col, row, term, value) with row 0 at the grid's NORTH edge — exactly
    the ASCII storage order, which is also how operators/raster.py
    addresses cells (``box_ymax = y0 - row*res`` with y0 the top edge).
    Returns the DataFrame plus (x0, y0_top, res); y0_top is derived from
    the header's lower-left corner (yllcorner + nrows*cellsize). NODATA
    cells are omitted (the sampler treats missing cells as NoData and
    grows the buffer, StationBases.py:848-913)."""
    records = [
        (c, r, term, v)
        for r, line in enumerate(rows)
        for c, v in enumerate(line)
        if v is not None
    ]
    df = spark.createDataFrame(
        records, "col int, row int, term string, value double"
    )
    y0_top = header["yllcorner"] + len(rows) * header["cellsize"]
    return df, header["xllcorner"], y0_top, header["cellsize"]


def select_newest_dem(datasets: Sequence[dict]) -> dict:
    """The reference's choice over the PRISM catalog
    (get_data.py:205-230): parse ``datasetId`` strings like
    ``COP-DEM_GLO-30-DGED/2023_1`` and keep the newest year/part at the
    highest resolution (smallest meter figure)."""
    parsed = [
        {
            "id": e["datasetId"],
            "year": int(e["datasetId"].split("/")[1].split("_")[0]),
            "year_part": int(e["datasetId"].split("/")[1].split("_")[1]),
            "resolution": int(e["datasetId"].split("-")[2].split("-")[0]),
        }
        for e in datasets
    ]
    return sorted(
        parsed,
        key=lambda d: (-d["year"], -d["year_part"], d["resolution"]),
    )[0]


def zenodo_record_files(doi: str = MA_RASTER_DOI) -> list[dict]:
    """Resolve a Zenodo DOI to its record's file list
    (get_data.py:59-66). NETWORK: requires outbound HTTPS; raises
    RuntimeError with guidance when the request layer is unavailable."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - env without requests
        raise RuntimeError(
            "downloading multi-annual rasters needs the 'requests' "
            "package and outbound network access; in offline "
            "environments ingest a pre-downloaded grid via "
            "read_ascii_grid + Broker.update_ma_raster_from_grid"
        ) from exc
    zenodo_id = _http_get(f"https://doi.org/{doi}").url.split("/")[-1]
    return _http_get(
        f"https://zenodo.org/api/records/{zenodo_id}"
    ).json()["files"]


def download_ma_rasters(
    out_dir: str | Path,
    which: Sequence[str] = ("dwd", "hyras", "regnie"),
    overwrite: bool = False,
) -> list[Path]:
    """Fetch the published multi-annual raster files (get_data.py:68-186)
    into ``out_dir``; returns the written paths. Selection mirrors the
    reference: a record file belongs to source ``k`` when its key's first
    ``_``/``-`` token matches. NETWORK: see :func:`zenodo_record_files`."""
    import requests

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for file in zenodo_record_files():
        file_key = file["key"].lower().split("_")[0].split("-")[0]
        if file_key not in which:
            continue
        target = out_dir / file["key"]
        if target.exists() and not overwrite:
            continue
        r = _http_get(file["links"]["self"], stream=True)
        with open(target, "wb") as fh:
            for chunk in r.iter_content(chunk_size=1 << 20):
                fh.write(chunk)
        written.append(target)
    return written


def ingest_ma_raster_dir(
    broker,
    parameter: str,
    raster_dir: str | Path,
    term_of: dict[str, str] | None = None,
) -> tuple[list[str], tuple[float, float, float]]:
    """The offline tail of S12: walk a directory of (already downloaded)
    ``.asc``/``.asc.gz`` grids — the layout :func:`download_ma_rasters`
    produces — parse each, and sample ALL terms into
    ``station_ma_raster`` with ONE ``update_ma_raster_from_grid`` call
    (the per-term grids union into one (col, row, term, value) table, so
    the expensive station-sampling join runs once).

    The term comes from the file stem's last ``_`` token (the DWD naming
    ``<source>_<term>.asc``, e.g. ``hyras_wihy.asc`` -> ``wihy``) unless
    ``term_of`` maps the file name explicitly. All grids must share one
    geometry (corner + cellsize); returns (ingested names, (x0, y0_top,
    res))."""
    paths = sorted(
        p for p in Path(raster_dir).iterdir()
        if p.name.endswith((".asc", ".asc.gz"))
    )
    if not paths:
        raise ValueError(f"no .asc/.asc.gz grids in {raster_dir}")
    combined: DataFrame | None = None
    geometry: tuple[float, float, float] | None = None
    for p in paths:
        header, rows = read_ascii_grid(p)
        stem = p.name.split(".")[0]
        term = (term_of or {}).get(p.name, stem.rsplit("_", 1)[-1])
        df, x0, y0_top, res = ascii_grid_df(broker.spark, header, rows, term)
        if geometry is None:
            geometry = (x0, y0_top, res)
        elif geometry != (x0, y0_top, res):
            raise ValueError(
                f"{p.name} geometry {(x0, y0_top, res)} differs from "
                f"{geometry} — the term grids must share one grid"
            )
        combined = df if combined is None else combined.unionByName(df)
    broker.update_ma_raster_from_grid(
        parameter, combined, x0=geometry[0], y0=geometry[1], res=geometry[2]
    )
    return [p.name for p in paths], geometry


def select_dem_tiles(
    ds_files: Sequence[dict], extent: tuple[float, float, float, float]
) -> list[dict]:
    """The reference's Copernicus tile selection (get_data.py:234-246):
    keep catalog entries whose ``nativeDemUrl`` names a
    ``Copernicus_DSM_xx_Nyy_xx_Ezz`` tile and whose 1-degree tile
    touches ``extent`` = (min_long, min_lat, max_long, max_lat). Pure —
    fixture-testable without the PRISM endpoint."""
    import re

    tile_re = re.compile(r".*/Copernicus_DSM_\d{2}_N\d*_\d{2}_E\d*.*")
    out = []
    for f in ds_files:
        url = f.get("nativeDemUrl", "")
        if not tile_re.match(url):
            continue
        stem = Path(url).stem.split("_")
        lat, long = int(stem[3][1:]), int(stem[5][1:])
        res_deg = 1  # tiles span one degree (get_data.py:241)
        if (
            (extent[0] - res_deg) < long < extent[2]
            and (extent[1] - res_deg) < lat < extent[3]
        ):
            out.append({"lat": lat, "long": long, **f})
    return out


def download_dem(
    out_dir: str | Path,
    extent: tuple[float, float, float, float] = (5.3, 46.1, 15.6, 55.4),
    overwrite: bool = False,
) -> Path:
    """Fetch + mosaic the newest Copernicus DEM over ``extent`` into one
    GeoTIFF (reference cli.py:117-157 ``download_dem``,
    get_data.py:189-327). NETWORK + rasterio: this environment has
    neither, so the fetch is import-gated; the catalog selection
    (:func:`select_newest_dem`, :func:`select_dem_tiles`) is the pure,
    tested part. Offline users sample a pre-downloaded ESRI-ASCII DEM
    via :func:`dem_sampler_from_grid` + ``Broker.update_horizon``."""
    try:
        import rasterio  # noqa: F401
        import requests
    except ImportError as exc:  # pragma: no cover - env without network libs
        raise RuntimeError(
            "download_dem needs the 'requests' and 'rasterio' packages "
            "plus outbound network access; in offline environments point "
            "dem_sampler_from_grid at a pre-downloaded .asc/.asc.gz DEM "
            "and run Broker.update_horizon with it"
        ) from exc
    import json
    import tarfile
    from contextlib import ExitStack
    from tempfile import TemporaryDirectory

    from rasterio.merge import merge as rio_merge

    _get = _http_get  # module-level: timeout + raise_for_status

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    catalog = json.loads(_get(PRISM_URL, headers={"Accept": "json"}).text)
    ds_id = select_newest_dem(catalog)["id"]
    dem_file = out_dir / f"{ds_id.replace('/', '__')}.tif"
    if dem_file.exists() and not overwrite:
        return dem_file
    ds_files = json.loads(
        _get(
            f"{PRISM_URL}/{ds_id.replace('/', '__')}",
            headers={"Accept": "json"},
        ).text
    )
    tiles = select_dem_tiles(ds_files, extent)
    with TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        for f in tiles:
            name = Path(f["nativeDemUrl"]).name
            (tmp / name).write_bytes(_get(f["nativeDemUrl"]).content)
        for tar_fp in sorted(tmp.glob("*.tar")):
            with tarfile.open(tar_fp) as t:
                tif = next(
                    n for n in t.getnames()
                    if "/DEM/" in n and n.endswith(".tif")
                )
                (tmp / Path(tif).name).write_bytes(
                    t.extractfile(tif).read()
                )
            tar_fp.unlink()
        with ExitStack() as stack:
            srcs = [
                stack.enter_context(rasterio.open(f))
                for f in sorted(tmp.glob("*.tif"))
            ]
            arr, transform = rio_merge(srcs)
            meta = srcs[0].meta.copy()
        meta.update(
            driver="GTiff", height=arr.shape[1], width=arr.shape[2],
            transform=transform,
        )
        with rasterio.open(dem_file, "w", **meta) as dst:
            dst.write(arr)
    return dem_file


def dem_sampler_from_grid(path: str | Path):
    """Build a picklable point sampler over one DEM ESRI-ASCII grid
    (plain or ``.gz``) for :meth:`Broker.update_horizon` — the offline
    tail of the reference's Copernicus DEM download (cli.py:117-157,
    get_data.py:233-327): nearest-cell elevation at (x, y), NaN outside
    the grid or on NODATA cells (operators/horizon.py treats NaN as
    no-data)."""
    import numpy as np

    header, rows = read_ascii_grid(path)
    arr = np.array(
        [[np.nan if v is None else v for v in line] for line in rows],
        dtype="float64",
    )
    x0 = float(header["xllcorner"])
    res = float(header["cellsize"])
    y_top = float(header["yllcorner"]) + len(rows) * res

    def sampler(xs: "np.ndarray", ys: "np.ndarray") -> "np.ndarray":
        xs = np.asarray(xs, dtype="float64")
        ys = np.asarray(ys, dtype="float64")
        cols = np.floor((xs - x0) / res).astype("int64")
        rws = np.floor((y_top - ys) / res).astype("int64")
        inside = (
            (cols >= 0) & (cols < arr.shape[1])
            & (rws >= 0) & (rws < arr.shape[0])
        )
        out = np.full(xs.shape, np.nan)
        out[inside] = arr[rws[inside], cols[inside]]
        return out

    return sampler

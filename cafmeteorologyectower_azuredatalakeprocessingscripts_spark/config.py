"""Site configuration (SURVEY.md §2.1 S7; §1.3).

The reference drives everything from an Excel workbook: one sheet per
site, ``Variable`` rows x ``{Flux, Met, Val_3, Val_4}`` value columns,
read into a nested dict (src/LTARCAFTowerReport.py:61) and consumed by
``readinfo`` (src/AzureDataLakeAccess.py:521-530) and the ADLS client
setup (:125-137). The column names are value *slots*, not tables: e.g.
``LE_B`` takes its lower bound from the ``Flux`` column and its upper
bound from the ``Met`` column.

Here the same contract becomes a typed driver-side object:

- ``SiteConfig.from_mapping`` accepts exactly the reference's nested
  dict shape (so a workbook-derived dict drops in unchanged);
- ``load_workbook`` reads the .xlsx directly when an Excel engine is
  installed (gated import — this container has none);
- secrets never enter the data plane: ``abfss_oauth_conf`` turns the
  CLIENTID/TENANTID/CLIENTSECRET values into the public Hadoop-Azure
  OAuth configuration keys, replacing the reference's SDK download
  client (src/AzureDataLakeAccess.py:125-148) with direct
  ``abfss://`` reads.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Any, Mapping

from .qc.grade import FluxQCConfig

#: Variable rows of the workbook template (DataLakeDownload_TEMPLATE.xlsx,
#: consumed at src/AzureDataLakeAccess.py:125-137, :346, :501-505, :521-530)
TEMPLATE_VARIABLES = (
    "storageaccountname", "path", "file_system", "CLIENTID", "TENANTID",
    "CLIENTSECRET", "LOCAL_DIRECT", "back", "UPLOAD", "grade", "LE_B",
    "H_B", "F_B", "ustar", "gg", "cls", "Ver",
)


@dataclass
class SiteConfig:
    """One site's job parameters (one workbook sheet)."""

    site: str
    ver: str = "V40826"
    storage_account: str | None = None
    file_system: str | None = None
    raw_path: str | None = None
    upload_path: str | None = None
    local_dir: str | None = None
    lookback_months: int = 1
    client_id: str | None = None
    tenant_id: str | None = None
    client_secret: str | None = None
    qc: FluxQCConfig = field(default_factory=FluxQCConfig)

    @classmethod
    def from_mapping(cls, site: str, access: Mapping[str, Mapping[str, Any]]) -> "SiteConfig":
        """Build from the reference's nested dict: ``access[valcol][var]``
        — note the workbook reads transpose to ``{column: {Variable:
        value}}`` exactly as ``pd.read_excel(...).to_dict()`` does."""

        def get(valcol: str, var: str, default: Any = None) -> Any:
            try:
                v = access[valcol][var]
            except KeyError:
                return default
            return default if v is None else v

        qc = FluxQCConfig(
            grade=int(get("Flux", "grade", 7)),
            le_bounds=(
                float(get("Flux", "LE_B", -150.0)),
                float(get("Met", "LE_B", 1000.0)),
            ),
            h_bounds=(
                float(get("Flux", "H_B", -150.0)),
                float(get("Met", "H_B", 1000.0)),
            ),
            fc_bounds=(
                float(get("Flux", "F_B", -60.0)),
                float(get("Met", "F_B", 20.0)),
            ),
            ustar=float(get("Flux", "ustar", 0.0)),
        )
        qc.validate()
        return cls(
            site=site,
            ver=str(get("Flux", "Ver", "V40826")),
            storage_account=get("Flux", "storageaccountname"),
            file_system=get("Flux", "file_system"),
            raw_path=get("Flux", "path"),
            upload_path=get("Flux", "UPLOAD"),
            local_dir=get("Flux", "LOCAL_DIRECT"),
            lookback_months=int(get("Flux", "back", 1)),
            client_id=get("Flux", "CLIENTID"),
            tenant_id=get("Flux", "TENANTID"),
            client_secret=get("Flux", "CLIENTSECRET"),
            qc=qc,
        )


_XLSX_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "p": "http://schemas.openxmlformats.org/package/2006/relationships",
}


def _xlsx_cell_value(cell, strings: list[str]) -> Any:
    """Typed value of one <c> element (shared string, inline string,
    boolean, or number — ints come back as int, like pandas)."""
    t = cell.get("t", "n")
    v = cell.find("m:v", _XLSX_NS)
    if t == "inlineStr":
        node = cell.find("m:is/m:t", _XLSX_NS)
        return node.text if node is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return strings[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() else num


def _col_index(ref: str) -> int:
    """0-based column from an A1-style cell reference."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def read_xlsx_sheet(
    path: str, sheet_name: str, index_col: str = "Variable"
) -> dict[str, dict[str, Any]]:
    """Minimal stdlib .xlsx reader (``zipfile`` + ``ElementTree`` — the
    format is just zipped XML) for the config-workbook shape: returns
    ``{column: {Variable: value}}``, the same nested dict
    ``pd.read_excel(path, sheet_name=site, index_col='Variable')
    .to_dict()`` produces at src/LTARCAFTowerReport.py:61. No Excel
    engine required; handles shared, inline, and formula-cached strings,
    booleans, and numbers. Not a general spreadsheet engine — no
    formula evaluation (the reference workbook is plain values)."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rid = None
        for sh in wb.find("m:sheets", _XLSX_NS):
            if sh.get("name") == sheet_name:
                rid = sh.get(f"{{{_XLSX_NS['r']}}}id")
        if rid is None:
            raise KeyError(f"sheet {sheet_name!r} not in workbook")
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = next(
            (
                r.get("Target")
                for r in rels.findall("p:Relationship", _XLSX_NS)
                if r.get("Id") == rid
            ),
            None,
        )
        if target is None:
            raise ValueError(
                f"workbook relationship {rid!r} for sheet {sheet_name!r} "
                "missing from xl/_rels/workbook.xml.rels"
            )
        strings: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall("m:si", _XLSX_NS):
                strings.append("".join(t.text or "" for t in si.iter(f"{{{_XLSX_NS['m']}}}t")))
        sheet = ET.fromstring(z.read("xl/" + target.lstrip("/").removeprefix("xl/")))
        rows: list[dict[int, Any]] = []
        for row in sheet.find("m:sheetData", _XLSX_NS):
            cells = {}
            for i, c in enumerate(row.findall("m:c", _XLSX_NS)):
                ref = c.get("r")
                cells[_col_index(ref) if ref else i] = _xlsx_cell_value(c, strings)
            rows.append(cells)
    if not rows:
        raise ValueError(f"sheet {sheet_name!r} is empty")
    header = rows[0]
    names = [n for n in header.values() if n is not None]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        # a malformed workbook would otherwise silently lose a column
        # (last duplicate wins in the dict build below)
        raise ValueError(
            f"sheet {sheet_name!r} header row has duplicate column "
            f"names: {dupes}"
        )
    idx_col = next(
        (i for i, name in header.items() if name == index_col), None
    )
    if idx_col is None:
        raise ValueError(
            f"sheet {sheet_name!r} header row has no {index_col!r} column "
            f"(found: {sorted(v for v in header.values() if v is not None)})"
        )
    out: dict[str, dict[str, Any]] = {
        name: {} for i, name in header.items() if i != idx_col and name is not None
    }
    for cells in rows[1:]:
        var = cells.get(idx_col)
        if var is None:
            continue
        for i, name in header.items():
            if i != idx_col and name is not None:
                out[name][var] = cells.get(i)
    return out


def load_workbook(path: str, sites: list[str]) -> dict[str, SiteConfig]:
    """Read the reference workbook directly (one sheet per site,
    ``index_col='Variable'`` — src/LTARCAFTowerReport.py:61). Uses
    pandas+openpyxl when installed; otherwise the stdlib
    :func:`read_xlsx_sheet` parser, so the workbook path works in any
    environment."""
    try:
        import pandas as pd

        reader = lambda site: pd.read_excel(
            path, sheet_name=site, index_col="Variable"
        ).to_dict()
    except ImportError:  # pragma: no cover - env-dependent
        reader = lambda site: read_xlsx_sheet(path, site)
    out = {}
    for site in sites:
        try:
            mapping = reader(site)
        except ImportError:
            # pandas present but no Excel engine — stdlib fallback
            mapping = read_xlsx_sheet(path, site)
        out[site] = SiteConfig.from_mapping(site, mapping)
    return out


def abfss_url(cfg: SiteConfig, *segments: str) -> str:
    """``abfss://{container}@{account}.dfs.core.windows.net/...`` path
    builder — the direct-read replacement for the reference's download
    loop (SURVEY.md §2.1 S3: month-partitioned path pruning comes from
    globbing these URLs)."""
    if not (cfg.file_system and cfg.storage_account):
        raise ValueError("file_system and storage_account are required")
    base = f"abfss://{cfg.file_system}@{cfg.storage_account}.dfs.core.windows.net"
    parts = [s.strip("/") for s in segments if s]
    return "/".join([base, *parts])


def month_globs(
    base: str,
    start: datetime.date,
    end: datetime.date,
    pattern: str = "*.dat",
) -> list[str]:
    """One glob per month folder ``{base}/{yyyy}/{mm}/{pattern}``
    covering [start, end] — plan-time partition pruning over the lake's
    month-partitioned raw zone (SURVEY.md §2.1 S3), replacing the
    reference's month-folder download loop
    (src/AzureDataLakeAccess.py:149-188: first-of-start-month through
    end, one ``get_paths`` listing per month). Compose ``base`` from
    :func:`abfss_url` for the lake, or any ``file://`` root — the same
    job runs on either. Selection finer than a month is the
    filename-date predicate (``sources/files.py``) or the scan-time
    range filter in ``run_tower_job``, both of which the reference also
    applies after its month listing."""
    if end < start:
        raise ValueError(f"end {end} precedes start {start}")
    out = []
    cursor = datetime.date(start.year, start.month, 1)
    while cursor <= end:
        out.append(f"{base.rstrip('/')}/{cursor.year:04d}/{cursor.month:02d}/{pattern}")
        cursor = (
            datetime.date(cursor.year + 1, 1, 1)
            if cursor.month == 12
            else datetime.date(cursor.year, cursor.month + 1, 1)
        )
    return out


def abfss_oauth_conf(cfg: SiteConfig) -> dict[str, str]:
    """Hadoop-Azure OAuth client-credentials configuration (public
    hadoop-azure keys) for ``spark.conf`` — secrets live in Spark conf,
    never in data columns."""
    acct = f"{cfg.storage_account}.dfs.core.windows.net"
    return {
        f"fs.azure.account.auth.type.{acct}": "OAuth",
        f"fs.azure.account.oauth.provider.type.{acct}": (
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
        ),
        f"fs.azure.account.oauth2.client.id.{acct}": cfg.client_id or "",
        f"fs.azure.account.oauth2.client.secret.{acct}": cfg.client_secret or "",
        f"fs.azure.account.oauth2.client.endpoint.{acct}": (
            f"https://login.microsoftonline.com/{cfg.tenant_id}/oauth2/token"
        ),
    }

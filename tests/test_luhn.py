"""Luhn-validated credit-card detection (pii.luhn_scan): planted
fixtures beyond the SQL parity test (pii_luhn_orders)."""

import pyarrow as pa

from packs_ray.functions.pii import _luhn_valid, luhn_scan

VALID = "4539148803436467"          # passes Luhn
INVALID = "4539148803436468"        # off-by-one check digit
VALID_DASHED = "4539-1488-0343-6467"
AMEX_VALID = "378282246310005"      # 15 digits, passes Luhn


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_luhn_checksum_kernel():
    ok = _luhn_valid([VALID, INVALID, VALID_DASHED, AMEX_VALID,
                      "1234567890123"])
    assert ok.tolist() == [True, False, True, True, False]


def test_luhn_scan_counts(ray_session):
    ds = _ds([
        {"id": 1, "text": f"pay {VALID_DASHED} now"},
        {"id": 2, "text": f"a {VALID} b {INVALID} c"},   # 2 cands, 1 valid
        {"id": 3, "text": "no digits here"},              # filtered out
        {"id": 4, "text": None},                          # filtered out
        {"id": 5, "text": "short 123456789012 run"},      # 12 digits: no cand
        {"id": 6, "text": f"card {AMEX_VALID}."},
    ])
    out = luhn_scan(ds, "id", "text").to_pandas().set_index("id").sort_index()
    assert out.index.tolist() == [1, 2, 6]
    assert out.loc[1].tolist() == [1, 1]
    assert out.loc[2].tolist() == [2, 1]
    assert out.loc[6].tolist() == [1, 1]


def test_luhn_scan_long_run_splits(ray_session):
    # 21 digits: greedy leftmost match takes 19, remainder (2) too short
    ds = _ds([{"id": 1, "text": "x 123456789012345678901 y"}])
    out = luhn_scan(ds, "id", "text").to_pandas()
    assert out["n_candidates"].tolist() == [1]


def test_iban_scan_known_ibans(ray_session):
    """iban_scan: published valid IBANs validate, a corrupted check
    digit fails, IBAN-free rows are skipped entirely, multiple
    candidates per row each get a verdict."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.pii import iban_scan

    rows = [
        (1, "send to GB82WEST12345698765432 please"),        # valid
        (2, "acct DE89370400440532013000 and GB82WEST12345698765431"),
        (3, "no bank info here"),
        (4, None),
    ]
    tbl = pa.table({"id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows],
                                     type=pa.string())})
    out = iban_scan(ray.data.from_arrow(tbl), "id", "text").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == [1, 2]
    assert list(out["n_candidates"]) == [1, 2]
    # row 2: DE IBAN valid, the tampered GB one is not
    assert list(out["n_valid"]) == [1, 1]

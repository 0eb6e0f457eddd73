"""The queries() dict is the driver's run order and each round's
correctness artifact records only a fixed prefix — so the schedule must
(a) keep oracle/query keysets identical, (b) put every entry that has
never been driver-green ahead of every entry that has, and (c) fit the
never-green set inside the driver's 50-entry window."""

import __spark_entry__ as e

DRIVER_WINDOW = 50


def test_oracle_and_query_keysets_match():
    assert set(e.oracle_sql()) == set(e.queries())


def test_pending_entries_lead_and_fit_the_window():
    qs = list(e.queries())
    green = e._driver_green()
    pending = [q for q in qs if q not in green]
    assert qs[: len(pending)] == pending
    if green:  # artifacts present: rotation must be active
        assert len(pending) <= DRIVER_WINDOW


def test_green_parser_ignores_garbage(tmp_path, monkeypatch):
    import json
    import os
    import shutil

    # a malformed artifact and a non-dict one must not break rotation
    src = os.path.dirname(os.path.abspath(e.__file__))
    dst = tmp_path
    shutil.copy(os.path.join(src, "__spark_entry__.py"), dst)
    (dst / "CORRECTNESS_r01.json").write_text("{not json")
    (dst / "CORRECTNESS_r02.json").write_text(json.dumps(["a", "b"]))
    (dst / "CORRECTNESS_r03.json").write_text(
        json.dumps(
            {
                "good": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                },
                "bad": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": False,
                    "err": None,
                },
                "errd": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": "boom",
                },
            }
        )
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_copy", dst / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._driver_green() == {"good"}

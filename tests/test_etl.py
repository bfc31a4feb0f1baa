"""ETL-surface tests beyond oracle parity: XML parse round-trip against
the parquet twins and get-or-create idempotence (SURVEY.md §5.2)."""

from __future__ import annotations


def test_xml_normalize_matches_parquet_twin(spark, sf_dir):
    from micmac_li3ds_spark.operators.etl import PQ_DIR, q_etl_xml_normalize

    rows = q_etl_xml_normalize(spark, sf_dir).collect()
    got: dict[str, dict] = {}
    for r in rows:  # re-assemble the posexploded coefficient rows
        d = got.setdefault(r["sensor_name"], r.asDict() | {"coeffs": {}})
        d["coeffs"][r["coeff_idx"]] = r["coeff"]
    want = {
        r["sensor_name"]: r.asDict()
        for r in spark.read.parquet(f"{PQ_DIR}/calibration.parquet").collect()
    }
    assert set(got) == set(want)
    for name, w in want.items():
        g = got[name]
        assert g["image_width"] == w["image_width"]
        assert g["focal"] == w["focal"]  # exact repr round-trip
        assert g["dist_model"] == w["dist_model"]
        assert [
            g["coeffs"][i] for i in sorted(g["coeffs"])
        ] == w["dist_coeffs"]
        assert sorted(g["coeffs"]) == list(range(1, len(w["dist_coeffs"]) + 1))
        assert g["ppx"] == w["ppx"] and g["ppy"] == w["ppy"]


def test_get_or_create_idempotent(spark, sf_dir):
    from micmac_li3ds_spark.operators.etl import q_etl_get_or_create

    first = sorted(tuple(r) for r in q_etl_get_or_create(spark, sf_dir).collect())
    second = sorted(tuple(r) for r in q_etl_get_or_create(spark, sf_dir).collect())
    assert first == second
    origins = {t[2] for t in first}
    assert origins == {"existing", "created"}


def test_transfo_closure_depths(spark, sf_dir):
    from micmac_li3ds_spark.operators.etl import q_etl_transfo_closure

    rows = q_etl_transfo_closure(spark, sf_dir).collect()
    depths = {r["depth"] for r in rows}
    assert depths == {1, 2, 3, 4}  # img → cam → block → platform → world
    # closure is a function on (source, ancestor): no duplicate pairs
    pairs = [(r["source_ref"], r["ancestor_ref"]) for r in rows]
    assert len(pairs) == len(set(pairs))

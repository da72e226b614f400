"""Driver-contract invariants: every queries() entry carries a full SQL
oracle (zero rows-only rows), and the registries agree with the entry
module — guards the import-order trap documented in oracle_pipeline.py
and catches a new row landing without its oracle."""

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs = E.queries()
    os_ = E.oracle_sql()
    assert set(qs) == set(os_), (
        sorted(set(qs) - set(os_)),
        sorted(set(os_) - set(qs)),
    )
    # the driver adjudicates only the FIRST 50 registered queries; round 8
    # re-packed the registry (tagged-union folds) so EVERY operator family
    # sits inside the hard-signal window — keep it that way
    assert len(qs) == 50
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.strip(), name

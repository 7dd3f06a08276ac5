"""Distributed join operators: attach_dim co-shuffle and broadcast
lookup semantics."""

import pyarrow as pa


def _fact():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 99], pa.int64()),
                "v": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )


def _dim():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "dk": pa.array([1, 2, 3, 4], pa.int64()),
                "name": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        )
    )


class TestAttachDim:
    def test_inner_join_semantics(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.join import attach_dim

        out = (
            attach_dim(_fact(), _dim(), "k", "dk", ["name"])
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        # unmatched fact key 99 drops; dim key 4 unused
        assert list(out["k"]) == [1, 2, 3]
        assert list(out["v"]) == [10, 20, 30]
        assert list(out["name"]) == ["a", "b", "c"]

    def test_name_clash_rejected(self, ray_session, quiet_data_context):
        import pytest

        from pdf_parser_ray.pipelines.join import attach_dim

        with pytest.raises(ValueError):
            attach_dim(_fact(), _dim(), "k", "dk", ["v"])

    def test_broadcast_lookup_default(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.join import broadcast_lookup

        out = (
            broadcast_lookup(_fact(), {1: "x", 2: "y"}, "k", "label", "missing")
            .to_pandas()
            .sort_values("k")
        )
        assert list(out["label"]) == ["x", "y", "missing", "missing"]

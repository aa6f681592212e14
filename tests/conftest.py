import pandas as pd
import pytest


@pytest.fixture(scope="session")
def spark():
    from tpc_di_spark.session import get_spark

    s = get_spark(app_name="tpc-di-spark-tests", cores=8, shuffle_partitions=8)
    yield s


def normalize(pdf: pd.DataFrame, sort_cols) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].where(pd.notna(out[c]), None)
    return out.sort_values(list(sort_cols)).reset_index(drop=True)


def assert_pdf_equal(left: pd.DataFrame, right: pd.DataFrame, sort_cols) -> None:
    l, r = normalize(left, sort_cols), normalize(right, sort_cols)
    pd.testing.assert_frame_equal(l, r, check_dtype=False, check_like=True)

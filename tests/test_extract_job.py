"""jobs/extract.py end-to-end with the pre-extraction dedup tiers: url-variant
duplicates (--url-dedup) and payload duplicates (--dedup) must be dropped
BEFORE the Arrow stage; the committed table holds one row per survivor."""

import pandas as pd

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.sources.atomic import read_table


def test_extract_job_url_dedup_tier(spark, tmp_path):
    from jobs.extract import main

    pdf = pages_pdf(6)
    base_url = pdf.loc[0, "url"]
    dup1 = pdf.iloc[[0]].copy()
    dup1["url"] = base_url + "?utm_source=tw&utm_medium=x"
    dup2 = pdf.iloc[[0]].copy()
    dup2["url"] = base_url + "#frag"
    src_pdf = pd.concat([pdf, dup1, dup2], ignore_index=True)
    src_dir = str(tmp_path / "src.parquet")
    spark.createDataFrame(src_pdf).write.parquet(src_dir)

    tbl = str(tmp_path / "out_tbl")
    main(["--source", src_dir, "--table", tbl, "--url-dedup", "--partitions", "4"])

    got = read_table(spark, tbl)
    urls = sorted(r["url"] for r in got.select("url").collect())
    assert len(urls) == 6  # 8 input rows -> 6 canonical survivors
    # min original url wins within the variant group
    assert base_url in urls and not any("utm_source" in u or "#" in u for u in urls)

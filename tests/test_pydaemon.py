"""The pydaemon worker patch (skip per-task importlib cache purge)
must be ACTIVE in workers and must preserve addPyFile semantics —
a module shipped mid-session becomes importable in already-warm
workers (the memo invalidates when the include list changes)."""

import os
import tempfile


def test_patch_active_in_workers(spark):
    def probe(it):
        import pandas as pd
        import pyspark.worker_util as wu

        for b in it:
            yield pd.DataFrame(
                {"m": [wu.setup_spark_files.__qualname__] * len(b)}
            )

    mods = {
        r.m
        for r in spark.range(0, 8, 1, 4).mapInPandas(probe, "m string").collect()
    }
    # the daemon module runs as __main__, so assert on the qualname of
    # the patched closure rather than __module__
    assert mods == {"_patch.<locals>.setup_spark_files"}


def test_add_py_file_visible_in_warm_workers(spark):
    sc = spark.sparkContext

    # warm the workers so their (files_dir, includes) memo is set
    def noop(it):
        for b in it:
            yield b

    spark.range(0, 32, 1, 4).mapInPandas(noop, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    d = tempfile.mkdtemp()
    mod = os.path.join(d, "pydaemon_dyn_mod.py")
    with open(mod, "w") as f:
        f.write("MAGIC = 31337\n")
    sc.addPyFile(mod)

    def use(it):
        import pandas as pd
        import pydaemon_dyn_mod

        for b in it:
            yield pd.DataFrame({"v": [pydaemon_dyn_mod.MAGIC] * len(b)})

    vals = {
        r.v for r in spark.range(0, 32, 1, 4).mapInPandas(use, "v long").collect()
    }
    assert vals == {31337}

"""rust_s2_spark — a PySpark-native S2 spatial-join + tiling engine.

Built from scratch on the Spark DataFrame API with numpy/Arrow kernels;
semantics match the public S2 cell decomposition as exercised by the
test suite of the reference library (yjh0502/rust-s2).
"""

__version__ = "0.1.0"

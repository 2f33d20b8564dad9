from ipydataclean_spark.functions.exact import davg, dsum, imax, isum  # noqa: F401
from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql  # noqa: F401
from ipydataclean_spark.functions.vector import cosine_sim, dot  # noqa: F401

from .pipeline import Pipeline  # noqa: F401
from .sql import execute_sql  # noqa: F401

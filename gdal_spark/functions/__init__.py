from .st_funcs import register_all  # noqa: F401

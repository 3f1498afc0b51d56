from .fmt import pystr, list_to_string, str_join  # noqa: F401

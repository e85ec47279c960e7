from .pathfns import leaf_path, file_name, ensure_trailing_backslash  # noqa: F401
from .jsonfns import dbfiles_to_json_agg, explode_dbfile_information  # noqa: F401

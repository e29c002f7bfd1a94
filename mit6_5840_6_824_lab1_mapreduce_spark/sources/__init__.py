from .binary import read_binary_assets
from .text import read_whole_files_df, write_text_output

__all__ = ["read_binary_assets", "read_whole_files_df", "write_text_output"]

from .text import read_whole_files_df, write_text_output

__all__ = ["read_whole_files_df", "write_text_output"]

from .textout import SystemTextOutput, choose_typing_tool, get_available_typing_tools

__all__ = [
    "SystemTextOutput",
    "choose_typing_tool",
    "get_available_typing_tools",
]

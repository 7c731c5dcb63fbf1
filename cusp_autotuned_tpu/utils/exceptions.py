"""Exception hierarchy.

Parity target: cusp/exception.h (cusp::exception and subclasses
format_exception, format_conversion_exception, not_implemented_exception,
invalid_input_exception, io_exception, runtime_exception).
"""


class CuspException(Exception):
    """Base class for all framework exceptions."""


class IOException(CuspException):
    pass


class FormatException(CuspException):
    pass


class FormatConversionException(FormatException):
    """Raised when a conversion is rejected (e.g. the DIA/ELL fill-ratio
    guard, mirroring cusp/system/detail/generic/conversions/coo_to_other.h:155-161)."""


class NotImplementedException(CuspException):
    pass


class InvalidInputException(CuspException):
    pass


class RuntimeException(CuspException):
    pass

"""Pure-Python pilsner-semantics kernel.

Everything in this subpackage is plain Python with no Spark dependency: it is
compiled once on the driver and shipped to executors via
``sparkContext.broadcast`` for use inside Arrow-batched pandas UDFs.
"""

from pilsner_spark.core.normalize import (  # noqa: F401
    NormalizerConfig,
    NormResult,
    load_normalizer_xml,
    normalizer_from_xml_string,
    normalize_with_map,
)
from pilsner_spark.core.dictionary import (  # noqa: F401
    FieldSpec,
    DictSpecs,
    compile_specs,
    parse_dictionary_line,
)
from pilsner_spark.core.model import CompiledModel  # noqa: F401

from .provider import (DuckdbMetadataProvider, MetadataProvider,  # noqa: F401
                       SqliteMetadataProvider, provider_for)
from .writer import (CatalogWriter, ColumnDef, DataFileInfo,  # noqa: F401
                     WriteMode, validate_name)

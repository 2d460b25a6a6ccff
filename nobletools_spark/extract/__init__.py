from .templates import (DocumentFilterDef, TemplateDef,  # noqa: F401
                        TemplateItemDef, parse_decimal_value,
                        process_template, section_table)

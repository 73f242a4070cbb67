package graft.render

/** Built-in cross-database macro namespace — the `dbt.*` macros real
  * projects call (`{{ dbt.dateadd(...) }}`, `{{ dbt.type_string() }}`,
  * `{{ dbt.concat([...]) }}`, …). In the reference these ship with the
  * adapters package (the dbt-adapters global project; dbt-core resolves
  * them through the internal `dbt` macro namespace,
  * `core/dbt/parser/manifest.py` macro resolution order: project >
  * adapter > internal). Spark dialect throughout; a project-level
  * `spark__<name>` / `default__<name>` macro overrides the builtin,
  * mirroring the reference's dispatch order (Engine.macroResolverFor).
  *
  * Deliberate Spark choices:
  *  - dateadd/datediff use `timestampadd`/`timestampdiff` (Spark 3.3+),
  *    which take the datepart as a bare keyword.
  *  - safe_cast is `try_cast` (NULL on failure, like the reference's
  *    warehouses with real SAFE_CAST).
  *  - listagg supports measure/delimiter/limit; an order_by_clause is a
  *    compiler error (collect_list has no deterministic ordering
  *    guarantee — failing loudly beats silently wrong order).
  */
object CrossDb {

  private val src: String =
    """{% macro current_timestamp() %}current_timestamp(){% endmacro %}
      |{% macro dateadd(datepart, interval, from_date_or_timestamp) %}timestampadd({{ datepart }}, {{ interval }}, {{ from_date_or_timestamp }}){% endmacro %}
      |{% macro datediff(first_date, second_date, datepart) %}timestampdiff({{ datepart }}, {{ first_date }}, {{ second_date }}){% endmacro %}
      |{% macro concat(fields) %}concat({{ fields | join(', ') }}){% endmacro %}
      |{% macro type_string() %}string{% endmacro %}
      |{% macro type_int() %}int{% endmacro %}
      |{% macro type_bigint() %}bigint{% endmacro %}
      |{% macro type_float() %}double{% endmacro %}
      |{% macro type_numeric() %}decimal(28, 6){% endmacro %}
      |{% macro type_timestamp() %}timestamp{% endmacro %}
      |{% macro type_boolean() %}boolean{% endmacro %}
      |{% macro string_literal(value) %}'{{ value }}'{% endmacro %}
      |{% macro escape_single_quotes(expression) %}{{ expression.replace("'", "\\'") }}{% endmacro %}
      |{% macro split_part(string_text, delimiter_text, part_number) %}split_part({{ string_text }}, {{ delimiter_text }}, {{ part_number }}){% endmacro %}
      |{% macro date_trunc(datepart, date) %}date_trunc('{{ datepart }}', {{ date }}){% endmacro %}
      |{% macro last_day(date, datepart) %}{% if datepart == 'month' %}last_day({{ date }}){% else %}cast(timestampadd({{ datepart }}, 1, date_trunc('{{ datepart }}', {{ date }})) - INTERVAL 1 DAY as date){% endif %}{% endmacro %}
      |{% macro position(substring_text, string_text) %}position({{ substring_text }}, {{ string_text }}){% endmacro %}
      |{% macro replace(field, old_chars, new_chars) %}replace({{ field }}, {{ old_chars }}, {{ new_chars }}){% endmacro %}
      |{% macro right(string_text, length_expression) %}right({{ string_text }}, {{ length_expression }}){% endmacro %}
      |{% macro length(expression) %}length({{ expression }}){% endmacro %}
      |{% macro safe_cast(field, type) %}try_cast({{ field }} as {{ type }}){% endmacro %}
      |{% macro cast(field, type) %}cast({{ field }} as {{ type }}){% endmacro %}
      |{% macro cast_bool_to_text(field) %}cast({{ field }} as string){% endmacro %}
      |{% macro hash(field) %}md5(cast({{ field }} as string)){% endmacro %}
      |{% macro any_value(expression) %}any_value({{ expression }}){% endmacro %}
      |{% macro bool_or(expression) %}bool_or({{ expression }}){% endmacro %}
      |{% macro listagg(measure, delimiter_text="','", order_by_clause=none, limit_num=none) %}{% if order_by_clause %}{{ exceptions.raise_compiler_error("listagg: order_by_clause is not supported on spark (collect_list order is not guaranteed)") }}{% endif %}{% if limit_num %}array_join(slice(collect_list({{ measure }}), 1, {{ limit_num }}), {{ delimiter_text }}){% else %}array_join(collect_list({{ measure }}), {{ delimiter_text }}){% endif %}{% endmacro %}
      |{% macro except() %}except{% endmacro %}
      |{% macro intersect() %}intersect{% endmacro %}
      |{% macro array_concat(array_1, array_2) %}concat({{ array_1 }}, {{ array_2 }}){% endmacro %}
      |{% macro array_append(array, new_element) %}array_append({{ array }}, {{ new_element }}){% endmacro %}
      |{% macro array_construct(inputs=[], data_type='int') %}{% if inputs %}array({{ inputs | join(', ') }}){% else %}array(){% endif %}{% endmacro %}
      |{% macro date(year, month, day) %}make_date({{ year }}, {{ month }}, {{ day }}){% endmacro %}
      |""".stripMargin

  /** name -> definition, parsed once at class load. */
  val macros: Map[String, Template.MacroDef] =
    Template.extractMacros(src).map(m => m.name -> m).toMap
}

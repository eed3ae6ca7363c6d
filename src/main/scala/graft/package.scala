import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A named engine query: (session, sf-directory) → result frame.
    * The sf directory is always a parameter — never hardcoded (driver
    * contract, SURVEY.md §0). */
  type Q = (SparkSession, String) => DataFrame
}

// Sample data quality script
//
// input: values for each column using the column name
// return: null if the row is valid, or a message if it is not valid
//

var ret = null;
if(symbol == "AXN")
    ret = "Symbol AXN was found, this is flagged for just testing purposes";
ret;